"""Streaming KG graph maintenance — keeping the materialized edge table
current as triples stream in (the live half of ``operators/kg_graph``'s
batch graph-materialize, north rule step 4).

Pattern: **delta-then-compact** (LSM-style), NOT in-stream global
aggregation state. A global ``groupBy(subj, pred, obj)`` in update mode
would hold one state row per distinct edge forever — at 10^12 turns the
edge vocabulary is itself huge, and streaming state is the wrong home
for it. Instead each micro-batch:

1. folds its OWN triples to edge-grain deltas (one partial-aggregating
   groupBy over at most a micro-batch of rows — bounded, stateless);
2. writes them to ``{graph_dir}/edge_deltas/batch_id=<id>`` with
   mode=overwrite — the same idempotency key Structured Streaming
   retries under, so a batch re-executed after a partial write replaces
   its own output (exactly-once without an additive-merge ledger; an
   additive MERGE would double-count on retry).

Readers call ``read_edge_rollup`` (base ⊎ deltas, one mergeable
groupBy); a maintenance job calls ``compact_edges`` to fold deltas into
the base (read-amplification bound, same FS-swap crash-safety seam as
``tableio.merge_upsert`` — on a real cluster both become one Iceberg
MERGE commit).

Mergeability is the design constraint and is explicit in the schema:
the rollup maintains ``weight`` (count → SUM), ``first_turn`` (MIN) and
``last_turn`` (MAX) — the algebraic aggregates. ``n_convs`` (exact
distinct) and the most-frequent NE-tag resolution are NOT mergeable
from per-batch deltas (distinct counts don't add; per-batch argmax
isn't global argmax) — those stay on the batch ``graph_edges`` path (or
an HLL-sketch column on a real cluster). Claiming them here would be
silently wrong, which is worse than absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_SCHEMA = ("conv_id string, turn_idx int, subj string, pred string,"
                 " obj string, subj_ne string, obj_ne string")

_EDGE_KEY = ["subj", "pred", "obj"]


def edge_deltas(triples: DataFrame) -> DataFrame:
    """Micro-batch triples → mergeable edge-grain deltas (one
    partial-aggregating groupBy; hub edges combine map-side)."""
    return (triples.groupBy(*_EDGE_KEY)
            .agg(F.count(F.lit(1)).alias("weight"),
                 F.min("turn_idx").alias("first_turn"),
                 F.max("turn_idx").alias("last_turn")))


def _merge(frames: list[DataFrame]) -> DataFrame:
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return (out.groupBy(*_EDGE_KEY)
            .agg(F.sum("weight").alias("weight"),
                 F.min("first_turn").alias("first_turn"),
                 F.max("last_turn").alias("last_turn")))


def read_edge_rollup(spark: SparkSession, graph_dir: str) -> DataFrame:
    """Current edge table = compacted base ⊎ pending deltas, folded by
    the algebraic merge. Either side may be absent (fresh stream / just
    compacted)."""
    from morra_spark.sources.tableio import read_existing_parquet

    parts = [p for p in (read_existing_parquet(spark, f"{graph_dir}/edges"),
                         read_existing_parquet(spark,
                                               f"{graph_dir}/edge_deltas"))
             if p is not None]
    if not parts:
        raise FileNotFoundError(f"no edge base or deltas under {graph_dir}")
    return _merge([p.select(*_EDGE_KEY, "weight", "first_turn", "last_turn")
                   for p in parts])


def compact_edges(spark: SparkSession, graph_dir: str) -> int:
    """Fold pending deltas into the base and clear them; returns the
    number of delta batch directories folded. Crash-safe up to the final
    directory swap (two FS metadata ops — the gap an Iceberg MERGE
    commit closes on a cluster, same caveat as ``tableio.merge_upsert``);
    re-running after any earlier crash point is idempotent because the
    deltas are only deleted after the swapped base already contains them.
    """
    from morra_spark.sources.tableio import read_existing_parquet

    deltas = read_existing_parquet(spark, f"{graph_dir}/edge_deltas")
    if deltas is None:
        return 0
    n_batches = deltas.select("batch_id").distinct().count()
    folded = read_edge_rollup(spark, graph_dir)
    tmp = f"{graph_dir}/edges__compact_tmp"
    folded.write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(graph_dir).getFileSystem(
        spark._jsc.hadoopConfiguration())
    base = jvm.org.apache.hadoop.fs.Path(f"{graph_dir}/edges")
    if fs.exists(base):
        fs.delete(base, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), base)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{graph_dir}/edge_deltas"), True)
    return n_batches


def start_streaming_edge_rollup(spark: SparkSession, *, triples_path: str,
                                graph_dir: str, checkpoint_location: str,
                                max_files_per_trigger: int = 1,
                                trigger_available_now: bool = False):
    """Stream the triple sink into per-batch edge deltas. Returns the
    StreamingQuery. On a cluster the source becomes the Iceberg triple
    table's incremental read; the sink pattern is unchanged."""
    stream = (spark.readStream
              .schema(TRIPLE_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(triples_path))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (edge_deltas(batch_df)
         .write.mode("overwrite")
         .parquet(f"{graph_dir}/edge_deltas/batch_id={batch_id}"))

    writer = (stream.writeStream
              .option("checkpointLocation", checkpoint_location)
              .foreachBatch(write_batch)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
