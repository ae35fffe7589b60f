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

Readers call ``read_edge_rollup`` (base ⊎ pending deltas, one mergeable
groupBy); a maintenance job calls ``compact_edges`` to fold deltas into
the base (read-amplification bound, same FS-swap crash-safety seam as
``tableio.merge_upsert`` — on a real cluster both become one Iceberg
MERGE commit).

Compaction correctness against a LIVE stream and crashes (code-review
r5 — the original version deleted the whole delta directory, racing
concurrent batch writes, and re-folded already-folded deltas after a
crash between swap and delete):

* the set of delta batch directories is SNAPSHOT-listed first; only
  those exact directories are folded and later deleted, so a batch the
  stream writes mid-compaction is untouched and folds next time;
* the new base carries a ``_folded_batches.json`` manifest (underscore
  prefix → invisible to parquet readers) naming every batch id it
  already contains; both the reader and the next compaction EXCLUDE
  manifested batch ids still on disk, so a crash between the base swap
  and the delta delete double-counts nothing — re-running just deletes
  the leftovers.

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


_EDGE_COLS = [*_EDGE_KEY, "weight", "first_turn", "last_turn"]


def _fold_edges(df: DataFrame) -> DataFrame:
    """The algebraic edge fold (SUM weight, MIN/MAX turns) — see the
    module docstring for why ONLY mergeable aggregates live here."""
    return (df.groupBy(*_EDGE_KEY)
            .agg(F.sum("weight").alias("weight"),
                 F.min("first_turn").alias("first_turn"),
                 F.max("last_turn").alias("last_turn")))


def read_edge_rollup(spark: SparkSession, graph_dir: str) -> DataFrame:
    """Current edge table = compacted base ⊎ PENDING deltas, folded by
    the algebraic merge (shared delta store — see
    ``streaming/deltastore.py`` for the manifest/crash-window
    semantics, originally built here and extracted for the SCD2
    assertion log)."""
    from morra_spark.streaming.deltastore import read_store

    try:
        return read_store(spark, f"{graph_dir}/edges",
                          f"{graph_dir}/edge_deltas",
                          _EDGE_COLS, _fold_edges)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"no edge base or deltas under {graph_dir}")


def compact_edges(spark: SparkSession, graph_dir: str) -> int:
    """Fold pending deltas into the base and delete exactly those delta
    directories; returns the number folded (shared delta store —
    snapshot-listed batches only, manifest-guarded crash window)."""
    from morra_spark.streaming.deltastore import compact

    return compact(spark, f"{graph_dir}/edges",
                   f"{graph_dir}/edge_deltas", _EDGE_COLS, _fold_edges)


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
