"""Streaming transitive-closure maintenance — keeping the materialized
hierarchy rollup (``components.transitive_closure``) current as
hierarchy edges stream in, on the shared delta-then-compact store
(``streaming/deltastore.py``, the edge-rollup / SCD2-history pattern).

Why this composes: the insert-only closure is ALGEBRAIC in exactly the
store's sense — ``extend_closure`` proved the closure is a min-fold
fixpoint that absorbs a dist-1 edge delta without re-deriving old
paths, so the store's fold callback is simply (min-fold the unioned
path rows, then run the shared ``_minplus_doubling`` fixpoint). A
retried micro-batch overwrites its own delta directory (exactly-once
without a ledger); a late edge lands in a later delta and the NEXT
read simply produces the corrected closure; compaction folds pending
deltas into the base behind the manifest, so the crash window between
base swap and delta delete never double-applies (min is idempotent
anyway — the manifest still saves the wasted re-fold).

The store's documented limitation applies with force here: EDGE
DELETES CANNOT STREAM (a min-fold cannot retract a path). A
delete-bearing hierarchy rebuilds via ``transitive_closure`` and
re-seeds the base — the same append-only split ``streaming/history.py``
documents for SCD2 intervals.

Read cost model: ``read_closure`` pays ⌈log2(delta edges on any
shortest path)⌉+1 doubling rounds over base ∪ pending (the
``extend_closure`` bound — micro-batch-sized deltas: 2-3 rounds,
independent of hierarchy depth); a freshly compacted store reads
back the base with ZERO doubling rounds (the deltas-empty fast path
returns before folding, ``deltastore.read_store``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EDGE_SCHEMA = "src string, dst string"

_COLS = ["src", "dst", "dist"]


def edge_deltas(batch: DataFrame) -> DataFrame:
    """Micro-batch hierarchy edges → distinct dist-1 path rows (the
    mergeable grain the closure fold consumes). Self-loops carry no
    reachability information and null endpoints no key — both dropped,
    the ``transitive_closure`` input rule."""
    return (batch.select("src", "dst")
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull()
                    & (F.col("src") != F.col("dst")))
            .distinct()
            .withColumn("dist", F.lit(1).cast("long")))


def _fold_closure(df: DataFrame) -> DataFrame:
    """The store's fold: min-fold unioned path rows (base closure ∪
    dist-1 deltas — exactly ``extend_closure``'s seed), then the shared
    doubling fixpoint."""
    from morra_spark.operators.components import _minplus_doubling

    seed = (df.groupBy("src", "dst").agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True))
    return _minplus_doubling(seed, 25, "streaming closure fold")


def read_closure(spark: SparkSession, clo_dir: str) -> DataFrame:
    """Current closure = compacted base extended by pending edge deltas
    — byte-identical to ``transitive_closure`` over every edge ever
    streamed (late arrivals included as of this read)."""
    from morra_spark.streaming.deltastore import read_store

    return read_store(spark, f"{clo_dir}/closure",
                      f"{clo_dir}/edge_deltas", _COLS, _fold_closure)


def compact_closure(spark: SparkSession, clo_dir: str) -> int:
    """Fold pending edge deltas into the materialized closure base;
    returns the number of batches folded."""
    from morra_spark.streaming.deltastore import compact

    return compact(spark, f"{clo_dir}/closure",
                   f"{clo_dir}/edge_deltas", _COLS, _fold_closure)


def start_streaming_closure(spark: SparkSession, *, edges_path: str,
                            clo_dir: str, checkpoint_location: str,
                            max_files_per_trigger: int = 1,
                            trigger_available_now: bool = False):
    """Stream a hierarchy-edge source into per-batch dist-1 deltas.
    Returns the StreamingQuery. Same sink pattern as the edge rollup /
    SCD2 history; on a cluster the source becomes the Iceberg hierarchy
    table's incremental read."""
    stream = (spark.readStream
              .schema(EDGE_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(edges_path))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (edge_deltas(batch_df)
         .write.mode("overwrite")
         .parquet(f"{clo_dir}/edge_deltas/batch_id={batch_id}"))

    writer = (stream.writeStream
              .option("checkpointLocation", checkpoint_location)
              .foreachBatch(write_batch)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
