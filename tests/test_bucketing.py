"""Bucketed co-located join: the equi join over same-bucketed tables must
plan ZERO shuffle exchanges; an unbucketed baseline shuffles both sides."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from morra_spark.plans.bucketing import colocated_join, write_bucketed


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<!Broadcast)Exchange (hash|range|Single)", plan))


@pytest.fixture(scope="module")
def bucketed(spark, pipeline_out, fixture_dir, tmp_path_factory):
    out, _ = pipeline_out
    base = tmp_path_factory.mktemp("buckets")
    spark.sql("DROP TABLE IF EXISTS t_pred")
    spark.sql("DROP TABLE IF EXISTS t_gold")
    pred = spark.read.parquet(f"{out}/triples") \
        .select("conv_id", "turn_idx", "subj", "pred", "obj")
    gold = spark.read.parquet(f"{fixture_dir}/gold_triples")
    write_bucketed(pred, "t_pred", str(base / "pred"), ["conv_id"], 8,
                   sort_cols=["conv_id"])
    write_bucketed(gold, "t_gold", str(base / "gold"), ["conv_id"], 8,
                   sort_cols=["conv_id"])
    return pred, gold


def test_colocated_join_is_shuffle_free(spark, bucketed):
    j = colocated_join(spark, "t_pred", "t_gold", ["conv_id"])
    assert _shuffles(j) == 0, j._jdf.queryExecution().executedPlan().toString()
    assert j.count() > 0


def test_unbucketed_baseline_shuffles(spark, bucketed):
    pred, gold = bucketed
    j = pred.join(gold.hint("merge"), ["conv_id"])
    assert _shuffles(j) >= 2  # both sides exchange without bucketing


def test_bucketed_groupby_is_shuffle_free(spark, bucketed):
    g = spark.table("t_pred").groupBy("conv_id").count()
    assert _shuffles(g) == 0, "bucket distribution should satisfy the agg"
