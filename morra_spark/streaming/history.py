"""Streaming temporal-KG maintenance — keeping ``functional_history``'s
SCD2 validity intervals current as assertions stream in (the live half
of the batch temporal tier, operators/kg_graph.functional_history).

Design: intervals are a VIEW; the maintained table is the DISTINCT
change-event set (subj, pred, obj, ts). SCD2 needs a per-key total
order, which makes the intervals themselves hostile to streaming state:
an in-stream ``applyInPandasWithState`` SCD2 would hold every key's
last value forever (unbounded state at KG vocabulary scale) AND be
wrong under late data — an assertion arriving after the watermark
closed its position in the order can split an already-emitted interval,
which no append-mode emission can retract. The distinct assertion set
has neither problem: it is the algebraic (set-union-mergeable) form of
the history, so the delta-then-compact store maintains it exactly-once
with bounded per-batch work, and ``read_history`` re-derives intervals
from scratch at read time — a late assertion lands in a later delta and
the NEXT read simply produces the corrected intervals. The derivation
cost is one (subj, pred)-keyed window over the change-event table,
which is bounded by distinct (key, ts, value) events — orders of
magnitude below the raw assertion stream (the batch operator's
pre-distinct is the same observation).

Storage protocol, shared with the edge rollup
(``streaming/deltastore.py``): per-micro-batch delta directories keyed
by batch_id (overwrite → retry-idempotent), manifest-guarded
compaction, snapshot-listed deletes safe against a live stream. The
fold here is DISTINCT — idempotent, so even a double-fold would be
harmless; the manifest still prevents the wasted work and keeps the
protocol uniform across stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSERT_SCHEMA = "subj string, pred string, obj string, ts timestamp"

_COLS = ["subj", "pred", "obj", "ts"]


def assertion_deltas(batch: DataFrame) -> DataFrame:
    """Micro-batch assertions → distinct change events (the mergeable
    grain). Null obj carries no assertable value (the batch operator's
    rule) and null ts has no position in the per-key order — both are
    dropped here so the stored set is exactly what interval derivation
    consumes."""
    return (batch.select(*_COLS)
            .filter(F.col("obj").isNotNull() & F.col("ts").isNotNull())
            .distinct())


def _fold_distinct(df: DataFrame) -> DataFrame:
    return df.distinct()


def read_assertions(spark: SparkSession, hist_dir: str) -> DataFrame:
    """Current distinct change-event set = base ⊎ pending deltas."""
    from morra_spark.streaming.deltastore import read_store

    return read_store(spark, f"{hist_dir}/assertions",
                      f"{hist_dir}/assert_deltas", _COLS, _fold_distinct)


def read_history(spark: SparkSession, hist_dir: str) -> DataFrame:
    """Current SCD2 intervals, derived from the maintained change-event
    set — byte-identical to running the batch operator over every
    assertion ever streamed (including late ones: see module
    docstring)."""
    from morra_spark.operators.kg_graph import functional_history

    return functional_history(read_assertions(spark, hist_dir))


def compact_assertions(spark: SparkSession, hist_dir: str) -> int:
    """Fold pending deltas into the assertion base; returns the number
    of batches folded."""
    from morra_spark.streaming.deltastore import compact

    return compact(spark, f"{hist_dir}/assertions",
                   f"{hist_dir}/assert_deltas", _COLS, _fold_distinct)


def start_streaming_history(spark: SparkSession, *, assertions_path: str,
                            hist_dir: str, checkpoint_location: str,
                            max_files_per_trigger: int = 1,
                            trigger_available_now: bool = False):
    """Stream an assertion source into per-batch change-event deltas.
    Returns the StreamingQuery. On a cluster the source becomes the
    Iceberg assertion table's incremental read; the sink pattern is
    unchanged."""
    stream = (spark.readStream
              .schema(ASSERT_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .parquet(assertions_path))

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (assertion_deltas(batch_df)
         .write.mode("overwrite")
         .parquet(f"{hist_dir}/assert_deltas/batch_id={batch_id}"))

    writer = (stream.writeStream
              .option("checkpointLocation", checkpoint_location)
              .foreachBatch(write_batch)
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
