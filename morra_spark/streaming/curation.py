"""Streaming document-curation ingest (SURVEY.md §2, curation ×
streaming): continuously arriving document files flow through the SAME
quality gate as the batch funnel, are exact-deduped across the whole
stream, and land in per-micro-batch idempotent output with per-batch
accounting — so a crawler feed is curated as it arrives instead of in
nightly batch sweeps.

Design points at 10^12-doc scale:

* Exact dedup across the stream uses ``dropDuplicates`` on the 64-bit
  xxhash of the text. That state is irreducible for GLOBAL streaming
  exact-dedup — one hash per distinct document ever seen — and is the
  operator's honest cost: 8 bytes/key in the state store (RocksDB on a
  real cluster) plus the store's overhead; 10^10 distinct docs ≈ tens
  of GB of keyed state, partitioned across executors by the state
  shuffle. If that is too much, bound it: cut over to the batch funnel
  (``q_curation_funnel``'s materialized form) on a schedule and reset
  the stream's state, or dedup within a watermark if the feed carries
  an event time. Collisions: 64-bit hash over 10^10 docs gives a
  ~3·10^-3 birthday probability of ONE false merge corpus-wide —
  acceptable for crawl curation; use the 128-bit md5 pair if not.
* The quality gate is the batch funnel's exact CASE chain — one code
  path for both tiers (mirrored assertions in the tests).
* Sink idempotency is per-batch directory overwrite, same contract as
  the triple sink (``incremental.make_batch_writer``): a retried batch
  replaces its own partial output; accounting rows carry batch_id so a
  replaced batch's row is overwritten too, never double-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = ("doc_id long, text string, lang string, source string,"
              " n_chars long")


def read_document_stream(spark: SparkSession, path: str,
                         max_files_per_trigger: int = 64) -> DataFrame:
    """File-based streaming source over the documents layout (an
    Iceberg streaming read on a real cluster — same schema)."""
    return (spark.readStream
            .schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(path))


def quality_reason(text_col: str = "text"):
    """The batch funnel's quality CASE chain (q_curation_funnel /
    q_quality_filter): NULL = keep, else the first failing rule.
    A NULL text fails FIRST ('null_text'): without the explicit rule
    every comparison below evaluates to NULL and the doc sails through
    the gate as kept, then seeds NULL placement rows in packing
    (code-review r5 — read_jsonl legitimately emits NULL-text rows for
    valid JSON lines missing the field). Mirrored in the DuckDB oracle
    SQL of both gate queries."""
    words = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(words)
    en = F.size(F.filter(words,
                         lambda x: x.isin("the", "a", "of", "and"))) / n
    return (F.when(F.col(text_col).isNull(), "null_text")
            .when(n < 8, "too_short")
            .when(n > 2000, "too_long")
            .when(en < 0.05, "low_en"))


def curate_stream(stream: DataFrame) -> DataFrame:
    """quality gate → whole-stream exact dedup on the text hash."""
    kept = stream.filter(quality_reason().isNull())
    return (kept.withColumn("text_h", F.xxhash64("text"))
            .dropDuplicates(["text_h"]))


def make_doc_batch_writer(out_dir: str):
    """foreachBatch sink: survivors to an overwritten batch_id dir +
    one accounting row per batch (docs, chars), same idempotency
    contract as the triple sink."""
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            (batch_df.drop("text_h")
             .write.mode("overwrite")
             .parquet(f"{out_dir}/docs/batch_id={batch_id}"))
            acct = batch_df.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.length("text")).cast("long").alias("n_chars"))
            (acct.write.mode("overwrite")
             .parquet(f"{out_dir}/accounting/batch_id={batch_id}"))
        finally:
            batch_df.unpersist()

    return write_batch


def start_curation_ingest(spark: SparkSession, *, docs_path: str,
                          out_dir: str, checkpoint_location: str,
                          max_files_per_trigger: int = 64,
                          trigger_available_now: bool = False):
    """Streaming curation: stream → quality gate → exact dedup →
    idempotent per-batch survivor sink. Returns the StreamingQuery."""
    stream = curate_stream(read_document_stream(
        spark, docs_path, max_files_per_trigger))
    writer = (stream.writeStream
              .option("checkpointLocation", checkpoint_location)
              .foreachBatch(make_doc_batch_writer(out_dir))
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def row_simhash_prefix16(text_col: str = "text", bits: int = 32):
    """ROW-LOCAL portable simhash prefix16 — bit-identical to the batch
    ``dedup.simhash_signatures(portable=True)`` bucket key (parity
    test-asserted), but computed entirely inside one row via
    higher-order array functions instead of an explode + groupBy.

    Streaming needs this form: a per-row column feeds
    ``dropDuplicates`` directly, whereas the batch shape's aggregation
    would force a second stateful operator. The 32 ``aggregate`` folds
    are one JVM expression tree per row — O(bits × words), the same
    arithmetic the batch version shuffles for.
    """
    from morra_spark.operators.dedup import _portable_hash60

    words = F.array_distinct(F.split(F.trim(F.col(text_col)), " "))
    hs = F.transform(words, lambda w: _portable_hash60(w))

    def merge_bit(j: int):
        # closure factory, NOT a default arg: pyspark infers the lambda's
        # arity from its parameter count, so `lambda acc, h, _j=j` would
        # be treated as a ternary lambda and mis-bind the variables
        return lambda acc, h: acc + F.when(
            F.shiftrightunsigned(h, j).bitwiseAND(1) == 1, 1).otherwise(-1)

    sim = F.lit(0).cast("long")
    for j in range(bits):
        bit_sum = F.aggregate(hs, F.lit(0), merge_bit(j))
        sim = sim + F.when(bit_sum >= 0, F.lit(1 << j)) \
            .otherwise(0).cast("long")
    return F.shiftrightunsigned(sim, bits - 16)


def curate_stream_near_dedup(stream: DataFrame) -> DataFrame:
    """quality gate → whole-stream exact dedup → whole-stream NEAR-dup
    suppression: at most one survivor per portable-simhash prefix16
    bucket ever (the streaming twin of ``dedup.diverse_sample``
    ``per_bucket=1``; with ordered arrival the survivor sets are
    identical — test-asserted).

    State cost is the part that matters: the bucket key space is 2^16,
    so the near-dup state is BOUNDED at 65,536 keys regardless of
    stream length — unlike the exact-dedup state (one key per distinct
    doc), this stage can run forever without a cutover schedule.
    """
    return (curate_stream(stream)
            .withColumn("nd_bucket", row_simhash_prefix16())
            .dropDuplicates(["nd_bucket"]))


def start_near_dedup_ingest(spark: SparkSession, *, docs_path: str,
                            out_dir: str, checkpoint_location: str,
                            max_files_per_trigger: int = 1,
                            trigger_available_now: bool = False):
    """Streaming curation with near-dup suppression; same idempotent
    per-batch sink contract as ``start_curation_ingest``."""
    stream = curate_stream_near_dedup(read_document_stream(
        spark, docs_path, max_files_per_trigger))
    writer = (stream.drop("nd_bucket").writeStream
              .option("checkpointLocation", checkpoint_location)
              .foreachBatch(make_doc_batch_writer(out_dir))
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
