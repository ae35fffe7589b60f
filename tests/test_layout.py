"""Sorted-layout writer: global order across files via range partition +
local sort; footer min/max ranges must be disjoint and ascending."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from morra_spark.session import get_spark
    return get_spark("test_layout")


def test_write_sorted_files_are_globally_ordered(spark, tmp_path):
    from morra_spark.plans.layout import file_key_ranges, write_sorted

    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1000))).alias("score"))
    out = str(tmp_path / "sorted")
    write_sorted(df, out, ["score"], n_files=8)

    ranges = file_key_ranges(spark, out, "score")
    assert len(ranges) >= 4
    # file k's max <= file k+1's min: ranges tile the key space
    for (_, _, hi), (_, lo2, _) in zip(ranges, ranges[1:]):
        assert hi <= lo2
    # within-file order: monotone non-decreasing
    import pyarrow.parquet as pq
    import os
    first = os.path.join(out, ranges[0][0])
    col = pq.read_table(first, columns=["score"])["score"].to_pylist()
    assert col == sorted(col)
    # nothing lost
    back = spark.read.parquet(out)
    assert back.count() == 10_000


def test_write_sorted_plans_single_range_exchange(spark, tmp_path):
    from morra_spark.plans.layout import write_sorted  # noqa: F401

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.col("id").alias("score"))
    plan = (df.repartitionByRange(4, F.col("score"))
            .sortWithinPartitions("score")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange rangepartitioning") == 1
    assert "Exchange hashpartitioning" not in plan


def test_write_sorted_tie_salting_spreads_constant_key(spark, tmp_path):
    from morra_spark.plans.layout import write_sorted
    import os

    df = spark.range(0, 5_000).select(
        F.col("id").alias("doc_id"), F.lit(7).alias("score"))
    out = str(tmp_path / "ties")
    write_sorted(df, out, ["score"], n_files=8)
    sizes = [os.path.getsize(os.path.join(out, f))
             for f in os.listdir(out) if f.endswith(".parquet")]
    # a constant key with salting still produces multiple balanced files
    assert len(sizes) >= 4
    assert max(sizes) < 3 * min(sizes)
