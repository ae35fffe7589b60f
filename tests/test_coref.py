"""Anaphora resolution (operators/coref.py): nearest-antecedent rule on
mention streams and on the pipeline's triple stream, plus the NPMI
co-mention edge suggester (operators/kg_graph.comention_edges)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from morra_spark.operators.coref import (resolve_anaphora,
                                         resolve_triple_anaphora)
from morra_spark.operators.kg_graph import comention_edges


def _mentions(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=t, pos=p, entity=e, is_anaphor=a)
         for (c, t, p, e, a) in rows])


def test_resolve_anaphora_nearest_antecedent(spark):
    m = _mentions(spark, [
        ("c1", 1, 0, "alice", False),
        ("c1", 2, 0, "it", True),       # -> alice
        ("c1", 3, 0, "bob", False),
        ("c1", 3, 1, "it", True),       # same turn, later pos -> bob
        ("c1", 4, 0, "they", True),     # -> bob (nearest, not alice)
        ("c2", 1, 0, "it", True),       # no antecedent -> NULL
        ("c2", 2, 0, "carol", False),
    ])
    out = {(r["conv_id"], r["turn_idx"], r["pos"]): r["resolved"]
           for r in resolve_anaphora(m).collect()}
    assert out[("c1", 2, 0)] == "alice"
    assert out[("c1", 3, 1)] == "bob"
    assert out[("c1", 4, 0)] == "bob"
    assert out[("c2", 1, 0)] is None
    # non-anaphors keep their own entity
    assert out[("c1", 1, 0)] == "alice" and out[("c1", 3, 0)] == "bob"
    assert out[("c2", 2, 0)] == "carol"


def test_resolve_anaphora_max_gap(spark):
    m = _mentions(spark, [
        ("c1", 1, 0, "alice", False),
        ("c1", 3, 0, "it", True),    # gap 2 <= 2 -> alice
        ("c1", 9, 0, "it", True),    # gap 8 > 2 -> NULL
    ])
    out = {r["turn_idx"]: r["resolved"]
           for r in resolve_anaphora(m, max_gap=2).collect()}
    assert out[3] == "alice" and out[9] is None


def test_resolve_anaphora_partitioning_invariant(spark):
    rows = [("c%d" % (i % 7), i // 7, i % 3,
             "e%d" % (i % 5) if i % 4 else "it", i % 4 == 0)
            for i in range(200)]
    m = _mentions(spark, rows)
    a = sorted(map(tuple, resolve_anaphora(m).collect()))
    b = sorted(map(tuple, resolve_anaphora(m.repartition(13)).collect()))
    assert a == b


def _triples(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=t, subj=s, pred=p, obj=o,
             subj_ne=sn, obj_ne=on)
         for (c, t, s, p, o, sn, on) in rows])


def test_triple_anaphora_rewrites_subject_only(spark):
    t = _triples(spark, [
        ("c1", 1, "alice", "uses", "spark", "Person", "Tech"),
        ("c1", 2, "it", "reads", "table", None, "Tech"),
        ("c1", 3, "bob", "merges", "branch", "Person", "Tech"),
        ("c1", 4, "they", "likes", "it", None, "Tech"),  # obj "it" kept
    ])
    out = sorted(resolve_triple_anaphora(t).collect(),
                 key=lambda r: r["turn_idx"])
    assert [(r["subj"], r["subj_ne"], r["obj"]) for r in out] == [
        ("alice", "Person", "spark"),
        ("alice", "Person", "table"),      # it -> alice, NE inherited
        ("bob", "Person", "branch"),
        ("bob", "Person", "it"),           # they -> bob; object untouched
    ]


def test_triple_anaphora_drops_unresolvable_and_same_turn(spark):
    t = _triples(spark, [
        ("c1", 1, "it", "does", "x", None, "T"),      # nothing earlier
        ("c1", 2, "zeb", "does", "y", "P", "T"),
        # same-turn pronoun: zeb sorts before "this"? turn 2 has both a
        # content row and a pronoun row; same-turn antecedent must NOT
        # count (strictly-earlier-turn rule) and turn 1 had none
        ("c1", 2, "this", "does", "z", None, "T"),
    ])
    out = resolve_triple_anaphora(t).collect()
    assert sorted((r["subj"], r["obj"]) for r in out) == [("zeb", "y")]


def test_triple_anaphora_same_turn_content_does_not_block(spark):
    """A pronoun whose OWN turn also carries content (sorting before it
    under the tie-break) must still resolve to the EARLIER turn's
    subject — same-turn content neither resolves it nor drops it."""
    t = _triples(spark, [
        ("c1", 1, "alice", "uses", "spark", "Person", "Tech"),
        # turn 2: content subject "bob" < pronoun "it" in sort order
        ("c1", 2, "bob", "merges", "x", "Person", "Tech"),
        ("c1", 2, "it", "reads", "y", None, "Tech"),
        # turn 3: pronoun sees turn 2's largest content subject
        ("c1", 3, "this", "does", "z", None, "Tech"),
    ])
    out = {(r["turn_idx"], r["obj"]): r["subj"]
           for r in resolve_triple_anaphora(t).collect()}
    assert out[(2, "y")] == "alice"   # strictly earlier turn, not bob
    assert out[(3, "z")] == "bob"
    assert len(out) == 4


def test_triple_anaphora_max_gap_and_passthrough_columns(spark):
    t = _triples(spark, [
        ("c1", 1, "alice", "uses", "spark", "Person", "Tech"),
        ("c1", 10, "it", "reads", "table", None, "Tech"),
    ]).withColumn("part_key", F.lit(7))
    kept = resolve_triple_anaphora(t, max_gap=3).collect()
    assert [(r["subj"], r["part_key"]) for r in kept] == [("alice", 7)]
    wide = resolve_triple_anaphora(t, max_gap=20).collect()
    assert sorted(r["subj"] for r in wide) == ["alice", "alice"]


def test_triple_anaphora_repartition_invariant(spark):
    rows = []
    for c in range(6):
        for t in range(30):
            subj = "it" if t % 3 == 2 else "e%d" % (t % 4)
            rows.append(("c%d" % c, t, subj, "p%d" % (t % 2),
                         "o%d" % (t % 5), "NE%d" % (t % 2), "NE0"))
    t = _triples(spark, rows)
    a = sorted(map(tuple, resolve_triple_anaphora(t).collect()))
    b = sorted(map(tuple,
                   resolve_triple_anaphora(t.repartition(17)).collect()))
    assert a == b and len(a) > 0


# ---------------------------------------------------------------------------
# comention_edges
# ---------------------------------------------------------------------------

def _docs_mentions(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=d, entity=e) for (d, e) in rows])


def test_comention_npmi_hand_computed(spark):
    # 4 docs; a&b together in 2, a alone in 1, b alone in 1, c everywhere
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"), (2, "c"),
            (3, "a"), (3, "c"),
            (4, "b"), (4, "c"),
            (4, "b")]  # duplicate mention must not double-count
    out = {(r["entity_a"], r["entity_b"]): r
           for r in comention_edges(_docs_mentions(spark, rows),
                                    min_pairs=2).collect()}
    ab = out[("a", "b")]
    assert ab["n_docs_both"] == 2 and ab["docs_a"] == 3 and ab["docs_b"] == 3
    expected = math.log((2 / 4) / ((3 / 4) * (3 / 4))) / -math.log(2 / 4)
    assert ab["npmi"] == pytest.approx(expected, abs=1e-6)
    # c co-occurs with everything in every doc it shares; a&c in 3 of 4
    ac = out[("a", "c")]
    exp_ac = math.log((3 / 4) / ((3 / 4) * 1.0)) / -math.log(3 / 4)
    assert ac["npmi"] == pytest.approx(exp_ac, abs=1e-6)


def test_comention_full_cooccurrence_is_npmi_one(spark):
    rows = [(d, e) for d in (1, 2, 3) for e in ("x", "y")]
    out = comention_edges(_docs_mentions(spark, rows), min_pairs=2).collect()
    assert len(out) == 1
    assert out[0]["npmi"] == pytest.approx(1.0)


def test_comention_min_pairs_and_doc_cap(spark):
    # one entity-soup doc with 10 entities, cap at 3 keeps e0,e1,e2
    rows = [(1, "e%d" % i) for i in range(10)]
    rows += [(2, "e0"), (2, "e1"), (3, "e0"), (3, "e1")]
    out = comention_edges(_docs_mentions(spark, rows),
                          min_pairs=2, doc_cap=3).collect()
    # only (e0,e1) appears in >=2 docs after the cap
    assert [(r["entity_a"], r["entity_b"], r["n_docs_both"])
            for r in out] == [("e0", "e1", 3)]


def test_resolve_anaphora_matches_python_reference(spark):
    """Seeded random mention streams vs a direct python reference of
    the nearest-antecedent rule — one Spark job over many
    conversations, not one per example."""
    import random

    rng = random.Random(7)
    rows, expected = [], {}
    for c in range(40):
        last = None
        for t in range(rng.randrange(1, 25)):
            is_ana = rng.random() < 0.4
            ent = "pron" if is_ana else "e%d" % rng.randrange(6)
            rows.append(("c%d" % c, t, 0, ent, is_ana))
            expected[("c%d" % c, t)] = last if is_ana else ent
            if not is_ana:
                last = ent
    out = {(r["conv_id"], r["turn_idx"]): r["resolved"]
           for r in resolve_anaphora(_mentions(spark, rows)).collect()}
    assert out == expected


def test_triple_anaphora_duplicate_ne_rows_deterministic(spark):
    """Duplicate (subj, pred, obj) content rows with differing NE tags
    (a real occurrence — graph_edges aggregates exactly this case) must
    yield ONE deterministic inherited tag: the largest, on any
    partitioning. Null-subj rows pass through and never antecede."""
    rows = [("c1", 1, "zed", "reads", "y", "Person", "T"),
            ("c1", 1, "zed", "reads", "y", "Zeta", "T"),
            ("c1", 1, None, "nul", "n", None, "T"),
            ("c1", 2, "it", "does", "x", None, "T")]
    t = _triples(spark, rows)
    outs = []
    for df in (t, t.repartition(7), t.repartition(3, "obj")):
        got = {(r["turn_idx"], r["pred"]): (r["subj"], r["subj_ne"])
               for r in resolve_triple_anaphora(df).collect()}
        assert got[(2, "does")] == ("zed", "Zeta")   # largest tag wins
        assert got[(1, "nul")] == (None, None)       # pass-through
        outs.append(sorted(got.items()))
    assert outs[0] == outs[1] == outs[2]
