"""Bucketed-table co-location (SURVEY.md §2 B-J2 scale path).

Large-large joins that repeat across runs (triples ⋈ gold, triples ⋈
entity rollups, pred ⋈ gold evaluation at 10^12-turn scale) shuffle both
sides EVERY run unless the tables are pre-bucketed on the join key. A
bucketed write pays one shuffle at write time; every later equi join on
the bucket key is shuffle-free on both sides (Spark plans SortMergeJoin
over the co-located buckets).

Local Spark needs a warehouse-backed managed/external table for bucket
metadata — ``saveAsTable`` with a path; the same calls target Iceberg
bucket-partition transforms on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, bucket_cols: list[str],
                   n_buckets: int = 16, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """One-time bucketed materialization: pays the shuffle now so every
    future equi join on ``bucket_cols`` is exchange-free."""
    w = (df.write.mode(mode).option("path", path)
         .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: list[str], how: str = "inner") -> DataFrame:
    """Join two tables bucketed on the same key/bucket-count: Catalyst
    recognizes the matching hash distribution and plans the SMJ with NO
    Exchange on either side (assert via tests/test_bucketing.py)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how)
