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
    }
    actual = set(E.queries()) - set(E.oracle_sql())
    assert actual == declared_rows_only, actual
