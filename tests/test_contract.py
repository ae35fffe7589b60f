"""Driver-contract hygiene (__spark_entry__): the invariants the
driver's correctness gate assumes, checked without a SparkSession so a
broken registration fails in milliseconds, not at gate time."""
from __future__ import annotations

import __spark_entry__ as E


def test_every_oracle_has_a_query():
    q, o = E.queries(), E.oracle_sql()
    dangling = set(o) - set(q)
    assert not dangling, f"oracles without queries: {sorted(dangling)}"


def test_oracle_sql_is_wellformed():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        # driver pre-registers exactly these views; an oracle referencing
        # a stray table name would fail only at gate time
        assert not sql.count("%s"), f"{name}: unformatted placeholder"


def test_query_callables_are_distinct_and_callable():
    q = E.queries()
    fns = list(q.values())
    assert all(callable(f) for f in fns)
    # a copy-paste slip registering the same function twice under two
    # names is almost always a bug
    names_by_fn = {}
    for name, f in q.items():
        names_by_fn.setdefault(f, []).append(name)
    dupes = {f.__name__: ns for f, ns in names_by_fn.items() if len(ns) > 1}
    assert not dupes, dupes


def test_rows_only_set_is_exactly_the_declared_one():
    declared_rows_only = {
        "kg_annotate_documents", "kg_flagship_triples", "kg_mention_spans",
        "kg_text_fidelity", "dedup_minhash_lsh_fast",
        "ann_ivf_topk", "multimodal_phash_dedup",
        "multimodal_audio_features",
        # graph materialize over perceptron-decoded triples (round 4);
        # reconciliation invariants pytest-pinned in test_kg_graph.py
        "kg_graph_edges", "kg_graph_nodes",
    }
    actual = set(E.queries()) - set(E.oracle_sql())
    assert actual == declared_rows_only, actual


def test_driver_window_holds_the_intended_first_50():
    """VERDICT r3 #1/#2: the driver's correctness gate checks the FIRST
    50 queries() entries only. Round 3 inserted new queries mid-dict and
    silently evicted 10 previously driver-validated entries from the
    window. Pin the round-4 window membership explicitly so an insertion
    that changes which queries get driver-checked fails HERE, loudly,
    instead of silently rotating coverage."""
    window = list(E.queries())[:50]
    expected = {
        # (a) new in round 4: correlated-subquery tier (SURVEY §4.2)
        # + grouping sets
        "tpch_q4", "tpch_q21", "tpch_q11", "tpch_q22",
        "tpch_q17", "tpch_q18", "grouping_sets_metrics",
        # (b) oracled, never driver-checked in rounds 1-3
        "graph_triangles", "quality_tiers", "weighted_sample",
        "embedding_centroids", "skew_report", "cohort_retention",
        "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q7", "tpch_q10",
        "tpch_q12", "tpch_q14", "tpch_q19", "corpus_drift",
        "rolling_zscore", "keyword_search", "dedup_editdist",
        "dedup_normalized", "event_paths", "vocab_encode",
        "corpus_datasheet", "pmi_collocations", "ab_metric_test",
        "rolling_active_users", "funnel_latency", "value_histogram",
        "dedup_incremental", "metric_correlations", "session_quality",
        "graph_pagerank", "percentile_metrics", "pivot_event_matrix",
        "scd2_intervals", "dedup_cluster", "dedup_cluster_survivors",
        "ann_lsh_bucketed",
        # (c) r2-green entries round 3 evicted, refreshed this round
        # (dedup_minhash_lsh/simhash/doc_fingerprint stay out — all
        # carry r2 driver-green records already)
        "dedup_exact", "dedup_exact_keep", "dedup_ngram_jaccard",
        "ann_cosine_topk", "embedding_near_dup", "langid_heuristic",
    }
    assert len(expected) == 50
    assert set(window) == expected, (
        sorted(set(window) - expected), sorted(expected - set(window)))
    # every window entry must be oracled (full rows+schema+hash check);
    # rows-only entries would waste a window slot on a weaker check
    o = set(E.oracle_sql())
    assert all(k in o for k in window)
