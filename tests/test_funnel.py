"""Funnel fold edge cases: ordering, ties, conversion window — the
engine-equivalence check vs the chained-aggregation DuckDB form lives
in scripts/oracle_check.py (funnel_steps)."""
from __future__ import annotations

from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def spark():
    from morra_spark.session import get_spark
    return get_spark("test_funnel")


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, h, m), t) for u, h, m, t in rows],
        "user_id long, ts timestamp, event_type string")


STEPS = ["signup", "view", "buy"]


def test_funnel_full_path_and_order(spark):
    from morra_spark.operators.funnel import funnel_user_steps

    ev = _ev(spark, [
        (1, 1, 0, "signup"), (1, 2, 0, "view"), (1, 3, 0, "buy"),
        # user 2: view BEFORE signup, never after -> stops at signup
        (2, 2, 0, "view"), (2, 3, 0, "signup"), (2, 1, 0, "buy"),
        # user 3: no signup at all
        (3, 1, 0, "view"), (3, 2, 0, "buy")])
    out = {r.user_id: r for r in funnel_user_steps(ev, STEPS).collect()}
    assert out[1].t1 and out[1].t2 and out[1].t3
    assert out[2].t1 is not None and out[2].t2 is None and out[2].t3 is None
    assert out[3].t1 is None


def test_funnel_tie_is_not_progress(spark):
    from morra_spark.operators.funnel import funnel_user_steps

    # view at EXACTLY the signup ts: strictly-after fails both engines
    ev = _ev(spark, [(1, 1, 0, "signup"), (1, 1, 0, "view"),
                     (1, 2, 0, "view")])
    r = funnel_user_steps(ev, STEPS).collect()[0]
    assert r.t2 == datetime(2024, 1, 2 - 1, 2, 0)


def test_funnel_conversion_window(spark):
    from morra_spark.operators.funnel import funnel_counts, funnel_user_steps

    ev = _ev(spark, [
        (1, 1, 0, "signup"), (1, 2, 0, "view"),    # within 1h: ok
        (2, 1, 0, "signup"), (2, 4, 0, "view")])   # 3h later: expired
    out = {r.user_id: r
           for r in funnel_user_steps(ev, STEPS, within_hours=2).collect()}
    assert out[1].t2 is not None and out[2].t2 is None
    rows = {r.step: r for r in
            funnel_counts(ev, STEPS, within_hours=2).collect()}
    assert rows["signup"].n_users == 2 and rows["view"].n_users == 1
    assert rows["view"].conversion == pytest.approx(0.5)
    assert rows["buy"].n_users == 0


def test_funnel_takes_first_eligible_not_any(spark):
    from morra_spark.operators.funnel import funnel_user_steps

    # two views after signup: t2 must be the FIRST one
    ev = _ev(spark, [(1, 1, 0, "signup"), (1, 2, 30, "view"),
                     (1, 5, 0, "view")])
    r = funnel_user_steps(ev, STEPS).collect()[0]
    assert r.t2 == datetime(2024, 1, 1, 2, 30)


def test_diverse_sample_caps_buckets(spark):
    from morra_spark.operators.dedup import diverse_sample

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma delta"),      # identical -> same bucket
         (3, "alpha beta gamma delta"),
         (4, "totally different content here")],
        "doc_id long, text string")
    kept = {r.doc_id: r for r in diverse_sample(docs, per_bucket=1).collect()}
    assert 1 in kept and 4 in kept          # lowest id survives per bucket
    assert 2 not in kept and 3 not in kept
    assert kept[1].bucket_n == 3 and kept[4].bucket_n == 1
    kept2 = {r.doc_id for r in diverse_sample(docs, per_bucket=2).collect()}
    assert kept2 == {1, 2, 4}


def test_interval_overlap_join_exact_pairs(spark):
    """Hand-built intervals: boundary touch counts as overlap, the
    multi-cell pair dedups to one row, disjoint pairs are absent."""
    from datetime import datetime
    from morra_spark.operators.intervals import interval_overlap_join

    def iv(rows):
        return spark.createDataFrame(
            [(i, datetime(2024, 1, 1, s), datetime(2024, 1, 1, e))
             for i, s, e in rows],
            "id long, s timestamp, e timestamp")

    left = iv([(1, 0, 2), (2, 5, 6), (3, 10, 11)])
    right = iv([(10, 1, 3),   # overlaps 1 ([1,2])
                (11, 2, 4),   # touches 1 at exactly 02:00 -> overlap 0
                (12, 6, 9),   # touches 2 at 06:00
                (13, 12, 13)])  # disjoint from everything
    # cell = 1h: the (1,10) pair shares cells 1 and 2 -> must dedup
    out = {(r.a_id, r.b_id): r.overlap_sec for r in
           interval_overlap_join(left, right, cell_seconds=3600).collect()}
    assert out == {(1, 10): 3600.0, (1, 11): 0.0, (2, 12): 0.0}


def test_interval_overlap_join_random_vs_bruteforce(spark):
    """Randomized cross-check: grid-cell equi-join ≡ O(n²) reference on
    arbitrary interval sets, across cell widths (incl. widths far
    smaller/larger than the intervals)."""
    import random
    from datetime import datetime, timedelta
    from morra_spark.operators.intervals import interval_overlap_join

    rng = random.Random(42)
    base = datetime(2024, 1, 1)

    def mk(n, id0):
        rows = []
        for i in range(n):
            s = rng.randint(0, 50_000)
            rows.append((id0 + i, base + timedelta(seconds=s),
                         base + timedelta(seconds=s + rng.randint(0, 9_000))))
        return rows

    for cell in (600, 3600, 40_000):
        la, rb = mk(60, 0), mk(60, 1000)
        want = {(a[0], b[0]) for a in la for b in rb
                if a[1] <= b[2] and b[1] <= a[2]}
        left = spark.createDataFrame(la, "id long, s timestamp, e timestamp")
        right = spark.createDataFrame(rb, "id long, s timestamp, e timestamp")
        got = [(r.a_id, r.b_id) for r in
               interval_overlap_join(left, right, cell_seconds=cell).collect()]
        assert len(got) == len(set(got)), "duplicate pairs leaked"
        assert set(got) == want


def test_top_event_paths_orders_and_truncates(spark):
    from morra_spark.operators.funnel import top_event_paths

    rows = []
    # two users with the same 3-step journey, one with a longer one
    for uid, seq in ((1, ["signup", "view", "click"]),
                     (2, ["signup", "view", "click"]),
                     (3, ["signup", "view", "click", "purchase", "view"])):
        for i, et in enumerate(seq):
            rows.append((uid * 100 + i, f"2026-01-01 00:0{i}:00", uid, et))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts",
                    "user_id", "event_type")
    out = [(r.path, r.n_users)
           for r in top_event_paths(df, max_len=4, top_k=5).collect()]
    assert out[0] == ("signup > view > click", 2)
    # the 5-event user truncates to the first 4
    assert out[1] == ("signup > view > click > purchase", 1)
