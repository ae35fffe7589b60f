"""Unit tests for skew diagnostics, cohort retention, and embedding
centroids — hand-computed expectations; engine-equivalence lives in
scripts/oracle_check.py."""
from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spark():
    from morra_spark.session import get_spark
    return get_spark("test_diagnostics")


def test_key_skew_report_hand_distribution(spark):
    from morra_spark.operators.diagnostics import key_skew_report

    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_report(df, "k", top_k=2).collect()
    assert [(r.key_value, r.n) for r in out] == [("a", 6), ("b", 3)]
    r = out[0]
    assert r.total_rows == 10 and r.n_keys == 3
    assert r.share == 0.6
    # H = -(0.6 lg 0.6 + 0.3 lg 0.3 + 0.1 lg 0.1)
    assert r.entropy_bits == pytest.approx(1.2955, abs=1e-4)


def test_key_skew_report_uniform_entropy_is_log2_n(spark):
    from morra_spark.operators.diagnostics import key_skew_report

    df = spark.createDataFrame([(f"k{i}",) for i in range(8)], "k string")
    out = key_skew_report(df, "k", top_k=3).collect()
    assert out[0].entropy_bits == pytest.approx(3.0, abs=1e-6)
    assert out[0].share == 0.125


def test_cohort_retention_hand_built(spark):
    from morra_spark.operators.diagnostics import cohort_retention

    # 2026-01-05 and 2026-01-12 are Mondays
    rows = [(1, "2026-01-05 10:00:00"), (1, "2026-01-14 10:00:00"),
            (2, "2026-01-07 10:00:00"),
            (3, "2026-01-12 10:00:00")]
    df = spark.createDataFrame(rows, "user_id long, ts string") \
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = {(str(r.cohort_week), r.week_offset): r
           for r in cohort_retention(df).collect()}
    assert out[("2026-01-05", 0)].n_active == 2
    assert out[("2026-01-05", 0)].retention == 1.0
    assert out[("2026-01-05", 1)].n_active == 1
    assert out[("2026-01-05", 1)].retention == 0.5
    assert out[("2026-01-12", 0)].n_active == 1
    assert out[("2026-01-12", 0)].cohort_size == 1
    assert len(out) == 3


def test_embedding_centroids_hand_computed(spark):
    from morra_spark.operators.similarity import embedding_centroids

    df = spark.createDataFrame(
        [(1, [1.0, 2.0], 7), (2, [3.0, 4.0], 7), (3, [10.0, 0.0], 8)],
        "vec_id long, embedding array<float>, label int")
    out = {(r.grp, r.dim): r for r in embedding_centroids(df).collect()}
    assert out[(7, 0)].centroid == 2.0 and out[(7, 0)].variance == 1.0
    assert out[(7, 1)].centroid == 3.0 and out[(7, 1)].variance == 1.0
    assert out[(7, 0)].n_vecs == 2
    assert out[(8, 0)].centroid == 10.0 and out[(8, 0)].variance == 0.0


def test_corpus_drift_zero_for_identical_and_one_for_disjoint(spark):
    from morra_spark.operators.diagnostics import corpus_drift

    a = spark.createDataFrame(
        [(1, "w " * 10, "en"), (2, "w " * 100, "en")],
        "doc_id long, text string, lang string")
    same = {r.grp: r.js_divergence
            for r in corpus_drift(a, a).collect()}
    assert same["en"] == 0.0
    # disjoint length bins: 10-token docs vs 1000-token docs
    b = spark.createDataFrame(
        [(1, "w " * 1000, "en"), (2, "w " * 2000, "en")],
        "doc_id long, text string, lang string")
    far = {r.grp: r.js_divergence for r in corpus_drift(a, b).collect()}
    assert far["en"] == 1.0


def test_corpus_drift_matches_python_reference(spark):
    import math
    from collections import Counter

    from morra_spark.operators.diagnostics import corpus_drift

    def bins(lens):
        c = Counter(math.floor(math.log2(n + 1)) for n in lens)
        t = sum(c.values())
        return {k: v / t for k, v in c.items()}

    la = [3, 5, 9, 17, 33, 120, 9, 5]
    lb = [3, 3, 70, 17, 500, 9]
    pa, pb = bins(la), bins(lb)
    js = 0.0
    for k in set(pa) | set(pb):
        p, q = pa.get(k, 0.0), pb.get(k, 0.0)
        m = (p + q) / 2
        if p:
            js += 0.5 * p * math.log2(p / m)
        if q:
            js += 0.5 * q * math.log2(q / m)
    a = spark.createDataFrame(
        [(i, "w " * n, "en") for i, n in enumerate(la)],
        "doc_id long, text string, lang string")
    b = spark.createDataFrame(
        [(i, "w " * n, "en") for i, n in enumerate(lb)],
        "doc_id long, text string, lang string")
    out = {r.grp: r for r in corpus_drift(a, b).collect()}
    assert out["en"].js_divergence == pytest.approx(round(js, 6), abs=2e-6)
    assert out["en"].docs_old == 8 and out["en"].docs_new == 6


def test_corpus_drift_new_group_is_maximal(spark):
    from morra_spark.operators.diagnostics import corpus_drift

    a = spark.createDataFrame([(1, "w " * 10, "en")],
                              "doc_id long, text string, lang string")
    b = spark.createDataFrame([(1, "w " * 10, "en"), (2, "w " * 10, "zh")],
                              "doc_id long, text string, lang string")
    out = {r.grp: r.js_divergence for r in corpus_drift(a, b).collect()}
    assert out["zh"] == 1.0  # brand-new language: maximally drifted
    assert out["en"] == 0.0


def test_rolling_zscore_hand_computed(spark):
    import math

    from morra_spark.operators.diagnostics import rolling_zscore

    # one user, values 10,10,10,10,100 — the spike's baseline is the
    # four 10s: mean 10, sd 0 -> z NULL (sd=0 division); use 10,12,10,12,100
    rows = [(i, f"2026-01-01 00:0{i}:00", 1, v)
            for i, v in enumerate([10.0, 12.0, 10.0, 12.0, 100.0])]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
                    "value")
    out = {r.event_id: r for r in rolling_zscore(df, lookback=20).collect()}
    assert out[0].zscore is None          # no priors
    assert out[1].zscore is None          # one prior -> sd undefined
    # event 4: baseline = [10,12,10,12], mean 11, sd = sqrt(4/3)
    sd = math.sqrt(4 / 3)
    assert out[4].baseline_mean == pytest.approx(11.0)
    assert out[4].baseline_sd == pytest.approx(sd)
    assert out[4].zscore == pytest.approx((100 - 11) / sd)
    assert out[4].anomalous is True
    assert out[2].anomalous is False and out[0].anomalous is False


def test_ab_metric_test_detects_planted_shift(spark):
    import hashlib

    from morra_spark.operators.diagnostics import ab_metric_test

    def arm_a(uid: int) -> bool:
        b = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 1000
        return b % 2 == 0

    rows = []
    eid = 0
    for uid in range(40):
        for k in range(30):
            # plant +10 on arm A for 'shifted'; identical for 'flat'
            base = 50.0 + (k % 7)
            rows.append((eid, uid, "shifted",
                         base + (10.0 if arm_a(uid) else 0.0)))
            eid += 1
            rows.append((eid, uid, "flat", base))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string,"
              " value double")
    out = {r.grp: r for r in ab_metric_test(df).collect()}
    assert out["shifted"].significant is True
    assert out["shifted"].mean_a - out["shifted"].mean_b == \
        pytest.approx(10.0, abs=1e-6)
    assert out["flat"].significant is False
    assert abs(out["flat"].t_stat) < 0.5


def test_rolling_active_users_hand_built(spark):
    from morra_spark.operators.diagnostics import rolling_active_users

    # user 1 active day 1 and 5; user 2 active day 1; window = 3 days
    rows = [(1, 1, "2026-01-01 10:00:00"), (2, 1, "2026-01-05 10:00:00"),
            (3, 2, "2026-01-01 12:00:00")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string") \
        .selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = {str(r.report_day): r.active_users
           for r in rolling_active_users(df, window_days=3).collect()}
    # day1 activity contributes to days 1-3; day5 to day 5 (clipped)
    assert out == {"2026-01-01": 2, "2026-01-02": 2, "2026-01-03": 2,
                   "2026-01-05": 1}


def test_value_histogram_hand_built(spark):
    from morra_spark.operators.diagnostics import value_histogram

    df = spark.createDataFrame([(float(v),) for v in range(100)],
                               "value double")
    out = {r.bin: r for r in value_histogram(df, "value", bins=10).collect()}
    assert len(out) == 10
    assert all(out[b].n == 10 for b in range(10))
    # the max lands in the LAST bin (clamped), not a phantom 11th
    assert out[9].bin_hi == pytest.approx(99.0)
    assert out[0].bin_lo == pytest.approx(0.0)


def test_value_histogram_constant_column(spark):
    from morra_spark.operators.diagnostics import value_histogram

    df = spark.createDataFrame([(5.0,)] * 7, "value double")
    out = value_histogram(df, "value", bins=10).collect()
    assert len(out) == 1 and out[0].bin == 0 and out[0].n == 7


def test_metric_correlations_detects_planted_seasonality(spark):
    rows = []
    eid = 0
    for day in range(1, 8):
        for hour in range(0, 24, 3):
            ts = f"2026-01-{day:02d} {hour:02d}:00:00"
            rows.append((eid, 1, "hourly", float(hour), ts))   # value == hour
            rows.append((eid + 1, 1, "flat", 5.0, ts))
            eid += 2
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string,"
              " value double, ts string") \
        .selectExpr("event_id", "user_id", "event_type", "value",
                    "CAST(ts AS TIMESTAMP) AS ts")
    from morra_spark.operators.diagnostics import metric_correlations
    out = {r.grp: r for r in metric_correlations(df).collect()}
    assert out["hourly"].corr_value_hour == 1.0
    assert out["flat"].corr_value_hour is None  # zero variance -> NULL
