"""KG query-layer operators (round 5 late additions): transitive
closure, 2-hop relation composition, and SCD2 triple-grain history —
each checked against a seeded plain-Python reference, plus the
convergence-round bound the 100 TB story depends on (path doubling is
O(log depth), not O(depth))."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- closure

def _py_closure(edges):
    """Brute-force min-hop reachability by BFS from every node."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out = {}
    for start in adj:
        frontier, dist = {start}, 0
        seen = {start}
        while frontier:
            dist += 1
            nxt = set()
            for v in frontier:
                for w in adj.get(v, ()):
                    if (start, w) not in out:
                        out[(start, w)] = dist
                        if w not in seen:
                            seen.add(w)
                            nxt.add(w)
            frontier = nxt
    return out


def test_transitive_closure_matches_bfs_on_random_dag(spark):
    from morra_spark.operators.components import transitive_closure

    rng = random.Random(7)
    # random DAG: edges only from lower to higher id → acyclic
    edges = sorted({(f"n{a}", f"n{b}")
                    for _ in range(120)
                    for a in [rng.randrange(30)]
                    for b in [rng.randrange(30)]
                    if a < b})
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.src, r.dst): r.dist
           for r in transitive_closure(df).collect()}
    assert got == _py_closure(edges)


def test_transitive_closure_handles_cycles(spark):
    from morra_spark.operators.components import transitive_closure

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {(r.src, r.dst): r.dist
           for r in transitive_closure(df).collect()}
    assert got == _py_closure(edges)
    assert got[("a", "a")] == 3  # the cycle's self-reach row


def test_transitive_closure_is_logarithmic_in_depth(spark):
    """A depth-16 chain must close within ceil(log2(16)) + 1 = 5
    doubling rounds — pass max_iter=5 and let the operator's own
    non-convergence raise be the assertion. A naive frontier loop
    would need 16."""
    from morra_spark.operators.components import transitive_closure

    chain = [(f"c{i}", f"c{i + 1}") for i in range(16)]
    df = spark.createDataFrame(chain, ["src", "dst"])
    out = transitive_closure(df, max_iter=5)
    assert out.count() == 16 * 17 // 2  # all (i, j>i) pairs
    top = out.filter((F.col("src") == "c0") & (F.col("dst") == "c16"))
    assert top.first().dist == 16


def test_subgraph_export_induces_exactly_the_neighborhood(spark):
    """Edges survive iff BOTH endpoints are within k hops; hop labels
    match khop_reach; edges fully outside the neighborhood vanish."""
    from morra_spark.operators.components import khop_reach, subgraph_export

    edges = [("s", "a"), ("a", "b"), ("b", "c"),   # chain: s-a-b-c
             ("x", "y")]                           # disconnected island
    e = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("s",)], ["node"])
    got = {(r.src, r.dst): (r.src_hops, r.dst_hops)
           for r in subgraph_export(e, seeds, k=2).collect()}
    # c is 3 hops out -> (b, c) is NOT induced; the island vanishes
    assert got == {("s", "a"): (0, 1), ("a", "b"): (1, 2)}
    hops = {r.node: r.hops
            for r in khop_reach(e, seeds, k=2).collect()}
    for (u, v), (hu, hv) in got.items():
        assert hops[u] == hu and hops[v] == hv


# ---------------------------------------------------- incremental closure

def test_extend_closure_matches_full_rebuild(spark):
    """Insert-only maintenance: extending yesterday's closure with a
    random edge delta must equal the from-scratch closure of the merged
    graph — same pairs, same exact min-hop distances (cycles included:
    the delta deliberately closes some)."""
    from morra_spark.operators.components import (extend_closure,
                                                  transitive_closure)

    rng = random.Random(11)
    base = sorted({(f"n{rng.randrange(20)}", f"n{rng.randrange(20)}")
                   for _ in range(40)})
    delta = sorted({(f"n{rng.randrange(20)}", f"n{rng.randrange(20)}")
                    for _ in range(8)})
    base = [(a, b) for a, b in base if a != b]
    delta = [(a, b) for a, b in delta if a != b]
    old = transitive_closure(spark.createDataFrame(base, ["src", "dst"]))
    got = {(r.src, r.dst): r.dist
           for r in extend_closure(
               old, spark.createDataFrame(delta, ["src", "dst"])).collect()}
    assert got == _py_closure(sorted(set(base) | set(delta)))


def test_extend_closure_rounds_scale_with_delta_not_depth(spark):
    """THE incremental win: bridging two depth-16 chains with ONE new
    edge must converge in ceil(log2(2*1+1)) + 1 = 3 doubling rounds —
    pass max_iter=3 and let the operator's non-convergence raise be the
    assertion — while a full rebuild of the resulting depth-33 chain
    needs ceil(log2(33)) + 1 = 7."""
    from morra_spark.operators.components import (extend_closure,
                                                  transitive_closure)

    chains = ([(f"a{i}", f"a{i + 1}") for i in range(16)]
              + [(f"b{i}", f"b{i + 1}") for i in range(16)])
    old = transitive_closure(spark.createDataFrame(chains, ["src", "dst"]))
    bridge = spark.createDataFrame([("a16", "b0")], ["src", "dst"])
    out = extend_closure(old, bridge, max_iter=3)
    # 17*16/2 pairs per chain + the bridge's 17*17 cross pairs + 16+16+1
    # ... simpler: exact end-to-end distance pins correctness
    row = (out.filter((F.col("src") == "a0") & (F.col("dst") == "b16"))
           .first())
    assert row.dist == 33
    assert out.count() == 2 * (17 * 16 // 2) + 17 * 17


def test_extend_closure_shortens_existing_distances(spark):
    """A delta edge that adds a shortcut must SHORTEN already-known
    pair distances, not just add pairs (min-fold semantics)."""
    from morra_spark.operators.components import (extend_closure,
                                                  transitive_closure)

    chain = [(f"c{i}", f"c{i + 1}") for i in range(6)]
    old = transitive_closure(spark.createDataFrame(chain, ["src", "dst"]))
    shortcut = spark.createDataFrame([("c0", "c5")], ["src", "dst"])
    got = {(r.src, r.dst): r.dist
           for r in extend_closure(old, shortcut).collect()}
    assert got[("c0", "c5")] == 1
    assert got[("c0", "c6")] == 2  # via the shortcut, was 6
    assert got[("c1", "c6")] == 5  # untouched path keeps its distance


def test_extend_closure_empty_delta_is_identity(spark):
    from morra_spark.operators.components import (extend_closure,
                                                  transitive_closure)

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    old = transitive_closure(spark.createDataFrame(edges, ["src", "dst"]))
    empty = spark.createDataFrame([], "src string, dst string")
    got = {(r.src, r.dst): r.dist for r in extend_closure(old, empty,
                                                          max_iter=1)
           .collect()}
    assert got == {(r.src, r.dst): r.dist for r in old.collect()}


# ------------------------------------------------------------ composition

def test_compose_relations_counts_and_caps_hubs(spark):
    from morra_spark.operators.kg_graph import compose_relations

    e1 = spark.createDataFrame(
        [("a", "m1"), ("a", "m2"), ("b", "m1"), ("b", "hub"),
         ("a", "m1")],  # duplicate assertion → distinct grain
        ["subj", "obj"])
    e2 = spark.createDataFrame(
        [("m1", "x"), ("m1", "y"), ("m2", "x"),
         ("hub", "h1"), ("hub", "h2"), ("hub", "h3")],
        ["subj", "obj"])
    got = {(r.subj, r.obj): (r.n_paths, r.top_mid)
           for r in compose_relations(e1, e2, mid_cap=2).collect()}
    # hub (fan-out 3 > cap 2) contributes nothing; m1+m2 both witness
    # (a, x) → n_paths 2, lexicographically smallest witness m1
    assert got == {("a", "x"): (2, "m1"), ("a", "y"): (1, "m1"),
                   ("b", "x"): (1, "m1"), ("b", "y"): (1, "m1")}


def test_compose_relations_plans_as_equijoin(spark):
    """The mid join and the cap anti-pattern must stay hash/SMJ
    equi-joins — no BroadcastNestedLoop/Cartesian anywhere (the
    plan-shape discipline of test_plan_shape.py applied locally)."""
    from morra_spark.operators.kg_graph import compose_relations

    e = spark.range(100).select(
        F.concat(F.lit("s"), (F.col("id") % 10).cast("string"))
        .alias("subj"),
        F.concat(F.lit("m"), (F.col("id") % 7).cast("string"))
        .alias("obj"))
    e2 = spark.range(100).select(
        F.concat(F.lit("m"), (F.col("id") % 7).cast("string"))
        .alias("subj"),
        F.concat(F.lit("o"), (F.col("id") % 5).cast("string"))
        .alias("obj"))
    plan = compose_relations(e, e2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# -------------------------------------------------------------- SCD2 / t

def _hist(rows):
    """Plain-python SCD2 reference over (subj, pred, obj, ts) tuples."""
    from collections import defaultdict
    per = defaultdict(set)
    for s, p, o, t in rows:
        per[(s, p)].add((t, o))
    out = []
    for (s, p), vals in per.items():
        seq = sorted(vals)
        starts = []
        prev = None
        for t, o in seq:
            if prev is None or o != prev:
                starts.append((t, o))
            prev = o
        for i, (t, o) in enumerate(starts):
            vt = starts[i + 1][0] if i + 1 < len(starts) else None
            out.append((s, p, o, t, vt, vt is None))
    return sorted(out, key=lambda r: (r[0], r[1], r[3], r[2]))


def test_functional_history_matches_python_reference(spark):
    from morra_spark.operators.kg_graph import functional_history

    rows = [
        # plain A → B → A flip-flop: three intervals, last open
        ("e1", "status", "A", 1), ("e1", "status", "B", 3),
        ("e1", "status", "A", 5),
        # duplicate re-assertions collapse (distinct grain)
        ("e1", "status", "B", 3), ("e1", "status", "A", 2),
        # equal-ts conflict: (ts=4, X) and (ts=4, Y) order by obj —
        # X gets the zero-length interval, Y carries forward
        ("e2", "status", "X", 4), ("e2", "status", "Y", 4),
        # single assertion → one open interval
        ("e3", "kind", "only", 9),
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj", "ts"])
    got = sorted(
        ((r.subj, r.pred, r.obj, r.valid_from, r.valid_to, r.is_current)
         for r in functional_history(df).collect()),
        key=lambda r: (r[0], r[1], r[3], r[2]))
    assert got == _hist(rows)
    # and the planted semantics explicitly:
    by = {(g[0], g[2], g[3]): g for g in got}
    assert by[("e2", "X", 4)][4] == 4          # zero-length interval
    assert by[("e2", "Y", 4)][5] is True       # Y is current
    assert by[("e1", "A", 5)][5] is True       # reopened value current


def test_functional_history_excludes_null_values(spark):
    """A null obj carries no assertable value; it must neither mint an
    interval nor break an adjacent change point (it would conflate
    with lag()'s first-row null marker otherwise)."""
    from morra_spark.operators.kg_graph import functional_history

    rows = [("e", "p", "A", 1), ("e", "p", None, 2), ("e", "p", "A", 3),
            ("n", "p", None, 1)]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj", "ts"])
    got = [(r.obj, r.valid_from, r.valid_to, r.is_current)
           for r in functional_history(df).orderBy("subj").collect()]
    # the null at ts=2 vanishes → A's single interval stays unbroken;
    # subject n (only null assertions) produces no history at all
    assert got == [("A", 1, None, True)]


def test_functional_history_excludes_null_ts(spark):
    """A null ts has no position in the per-key order: left in, it
    would sort first, open a valid_from=null interval that swallows a
    later real assertion's change point, and vanish from every as_of
    snapshot (code-review r5). It must be dropped like null obj —
    keeping byte-parity with streaming/history.assertion_deltas."""
    from morra_spark.operators.kg_graph import as_of, functional_history

    rows = [("e", "p", "A", None), ("e", "p", "A", 5)]
    df = spark.createDataFrame(rows, "subj string, pred string,"
                                     " obj string, ts int")
    got = [(r.obj, r.valid_from, r.is_current)
           for r in functional_history(df).collect()]
    assert got == [("A", 5, True)]
    assert [(r.subj, r.obj) for r in
            as_of(functional_history(df), 6).collect()] == [("e", "A")]


def test_functional_history_randomized_against_reference(spark):
    """Seeded stress input: 40 (subj, pred) keys × random value streams
    with deliberate duplicates and equal-ts conflicts — one Spark job,
    full-set equality with the python SCD2 reference (the pure-python
    hypothesis suite can't touch Spark, so the randomized sweep lives
    here with a fixed seed)."""
    from morra_spark.operators.kg_graph import functional_history

    rng = random.Random(11)
    rows = []
    for k in range(40):
        subj, pred = f"s{k % 13}", f"p{k % 5}"
        for _ in range(rng.randrange(1, 12)):
            rows.append((subj, pred,
                         rng.choice("ABC"), rng.randrange(8)))
    rows += rng.choices(rows, k=20)  # planted exact duplicates
    df = spark.createDataFrame(rows, ["subj", "pred", "obj", "ts"])
    got = sorted(
        ((r.subj, r.pred, r.obj, r.valid_from, r.valid_to, r.is_current)
         for r in functional_history(df).collect()),
        key=lambda r: (r[0], r[1], r[3], r[2]))
    assert got == _hist(rows)


def test_as_of_snapshots_are_exact_at_change_points(spark):
    """as_of(history, T) must return exactly the believed value for
    every key at every probe T — including AT a change instant (new
    value wins, half-open intervals) and before first assertion
    (absent). Checked against the python reference at every ts in
    range."""
    from morra_spark.operators.kg_graph import as_of, functional_history

    rows = [("e1", "p", "A", 1), ("e1", "p", "B", 3), ("e1", "p", "A", 6),
            ("e2", "p", "X", 4), ("e2", "p", "Y", 4),  # equal-ts conflict
            ("e3", "q", "only", 9)]
    h = functional_history(
        spark.createDataFrame(rows, ["subj", "pred", "obj", "ts"]))
    h = h.persist()
    try:
        ref = _hist(rows)
        for t in range(0, 11):
            want = {(s, p): o for (s, p, o, vf, vt, _c) in ref
                    if vf <= t and (vt is None or vt > t)}
            got = {(r.subj, r.pred): r.obj for r in as_of(h, t).collect()}
            assert got == want, f"ts={t}: {got} != {want}"
    finally:
        h.unpersist()


# ----------------------------------------------------------- graph audits

def test_edge_diff_labels_every_transition(spark):
    from morra_spark.operators.kg_graph import edge_diff

    v1 = spark.createDataFrame(
        [("a", "p", "x", 3), ("a", "p", "y", 2), ("b", "q", "z", 1)],
        ["subj", "pred", "obj", "weight"])
    v2 = spark.createDataFrame(
        [("a", "p", "x", 3),            # unchanged
         ("a", "p", "y", 5),            # changed (+3)
         ("c", "r", "w", 4)],           # added
        ["subj", "pred", "obj", "weight"])
    got = {(r.subj, r.pred, r.obj): (r.status, r.w_old, r.w_new, r.delta)
           for r in edge_diff(v1, v2).collect()}
    assert got == {
        ("a", "p", "x"): ("unchanged", 3, 3, 0),
        ("a", "p", "y"): ("changed", 2, 5, 3),
        ("b", "q", "z"): ("removed", 1, 0, -1),
        ("c", "r", "w"): ("added", 0, 4, 4),
    }


def test_edge_diff_plans_as_cokeyed_equijoin(spark):
    """The CDC diff must plan its full-outer join as a hash/SMJ
    equi-join on the edge key — no BroadcastNestedLoop/Cartesian — so
    a 10^9-edge build-over-build diff stays one co-keyed shuffle."""
    from morra_spark.operators.kg_graph import edge_diff

    def edges(mod):
        return spark.range(500).select(
            F.concat(F.lit("s"), (F.col("id") % mod).cast("string"))
            .alias("subj"),
            F.lit("p").alias("pred"),
            F.concat(F.lit("o"), (F.col("id") % 17).cast("string"))
            .alias("obj"),
            F.lit(1).alias("weight"))

    plan = edge_diff(edges(11), edges(13))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower(), plan


def test_degree_distribution_buckets_and_hubs(spark):
    from morra_spark.operators.kg_graph import degree_distribution

    # hub 'h' has out-degree 5 (bucket 2); singles land in bucket 0
    edges = ([("h", "p", f"o{i}") for i in range(5)]
             + [("s1", "p", "o0"), ("s2", "p", "o0")])
    df = spark.createDataFrame(edges, ["subj", "pred", "obj"])
    got = {(r.direction, r.bucket): (r.n_entities, r.max_degree)
           for r in degree_distribution(df).collect()}
    # out: h deg 5 → bucket 2; s1, s2 deg 1 → bucket 0
    assert got[("out", 2)] == (1, 5)
    assert got[("out", 0)] == (2, 1)
    # in: o0 deg 3 → bucket 1; o1..o4 deg 1 → bucket 0
    assert got[("in", 1)] == (1, 3)
    assert got[("in", 0)] == (4, 1)
    assert set(got) == {("out", 2), ("out", 0), ("in", 1), ("in", 0)}


def test_functional_history_single_exchange(spark):
    """Both window passes share the (subj, pred) partitioning — the
    whole operator must plan over exactly ONE shuffle (plus the
    pre-distinct's, which reuses the same keys' hash layout only if
    Catalyst chooses; the assertion pins 'no exchange explosion':
    <= 2 hash exchanges total, none of them RoundRobin)."""
    from morra_spark.operators.kg_graph import functional_history

    df = spark.range(1000).select(
        F.concat(F.lit("s"), (F.col("id") % 50).cast("string"))
        .alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("v"), (F.col("id") % 3).cast("string"))
        .alias("obj"),
        (F.col("id") % 37).alias("ts"))
    plan = functional_history(df)._jdf.queryExecution() \
        .executedPlan().toString()
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch <= 2, plan
    assert "roundrobin" not in plan.lower()


# ------------------------------------------------ personalized pagerank

def _py_ppr(edges, seeds, iters=5, damping=0.85):
    es = set()
    for a, b in edges:
        es.add((a, b))
        es.add((b, a))
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    deg = {a: len(bs) for a, bs in adj.items()}
    r = {s: 1.0 / len(seeds) for s in seeds}
    for _ in range(iters):
        nxt = {s: (1.0 - damping) / len(seeds) for s in seeds}
        for a, mass in r.items():
            for b in adj.get(a, ()):
                nxt[b] = nxt.get(b, 0.0) + damping * mass / deg[a]
        r = nxt
    return r


def test_ppr_matches_python_reference_and_conserves_mass(spark):
    from morra_spark.operators.components import personalized_pagerank

    rng = random.Random(23)
    edges = sorted({(f"v{rng.randrange(10)}", f"v{rng.randrange(10)}")
                    for _ in range(18)})
    edges = [(a, b) for a, b in edges if a != b]
    seeds = ["v0", "v3"]
    got = {r.node: r.ppr
           for r in personalized_pagerank(
               spark.createDataFrame(edges, ["src", "dst"]),
               spark.createDataFrame([(s,) for s in seeds], ["node"]),
               round_to=12).collect()}
    want = _py_ppr(edges, seeds)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ppr_locality_and_unreached_nodes_absent(spark):
    from morra_spark.operators.components import personalized_pagerank

    chain = [(f"c{i}", f"c{i+1}") for i in range(8)]
    island = [("x", "y")]
    df = spark.createDataFrame(chain + island, ["src", "dst"])
    seeds = spark.createDataFrame([("c0",)], ["node"])
    got = {r.node: r.ppr
           for r in personalized_pagerank(df, seeds, iters=4).collect()}
    assert got["c1"] > got["c3"] > 0  # relatedness decays with distance
    assert "c5" not in got            # beyond iters hops: no row
    assert "x" not in got and "y" not in got  # disconnected island


def test_ppr_empty_seeds_raise(spark):
    from morra_spark.operators.components import personalized_pagerank

    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError, match="empty seed"):
        personalized_pagerank(
            df, spark.createDataFrame([], "node string"))


# ---------------------------------------------- link-prediction metrics

def test_ranking_metrics_hand_computed_with_ties(spark):
    from morra_spark.plans.evaluate import ranking_metrics

    rows = [
        # q1: positive at rank 1 and rank 3
        ("s1", "p", "a", 0.9, True),
        ("s1", "p", "b", 0.8, False),
        ("s1", "p", "c", 0.7, True),
        # q2: tied scores -> candidate-id tie-break puts d before e,
        # so the positive e lands at rank 2 (the conservative direction)
        ("s2", "p", "d", 0.5, False),
        ("s2", "p", "e", 0.5, True),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string,"
              " score double, is_pos boolean")
    [m] = ranking_metrics(df, ks=(1, 3)).collect()
    assert (m.n_queries, m.n_pos) == (2, 3)
    assert m.mrr == pytest.approx((1 + 1 / 3 + 1 / 2) / 3)
    assert m.hits_1 == pytest.approx(1 / 3)
    assert m.hits_3 == pytest.approx(1.0)
    # bit-reproducible on any partitioning (the tie is deterministic)
    [m2] = ranking_metrics(df.repartition(7), ks=(1, 3)).collect()
    assert (m2.mrr, m2.hits_1, m2.hits_3) == (m.mrr, m.hits_1, m.hits_3)


def test_ranking_metrics_perfect_model_is_all_ones(spark):
    from morra_spark.plans.evaluate import ranking_metrics

    rows = [(f"s{q}", "p", f"o{i}", 1.0 - i * 0.1, i == 0)
            for q in range(4) for i in range(5)]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string,"
              " score double, is_pos boolean")
    [m] = ranking_metrics(df).collect()
    assert m.mrr == pytest.approx(1.0)
    assert m.hits_1 == pytest.approx(1.0) and m.hits_10 == pytest.approx(1.0)


# ------------------------------------------------------- shortest paths

def _py_shortest_paths(edges, seeds, k):
    """Level DP: best (lex-min) shortest path per node, BFS frontier."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    best = {s: (0, [s]) for s in seeds}
    frontier = {s: [s] for s in seeds}
    for level in range(1, k + 1):
        nxt = {}
        for u, p in frontier.items():
            for v in adj.get(u, ()):
                if v in best:
                    continue
                cand = p + [v]
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        for v, p in nxt.items():
            best[v] = (level, p)
        frontier = nxt
    return best


def test_shortest_paths_lexmin_witness(spark):
    from morra_spark.operators.components import shortest_paths

    # two equal-length routes s->m1->t and s->m2->t: the witness must
    # be the lexicographically smaller sequence via m1
    edges = [("s", "m2"), ("s", "m1"), ("m2", "t"), ("m1", "t")]
    out = {r.node: (r.hops, list(r.path))
           for r in shortest_paths(
               spark.createDataFrame(edges, ["src", "dst"]),
               spark.createDataFrame([("s",)], ["node"]), k=2).collect()}
    assert out["t"] == (2, ["s", "m1", "t"])
    assert out["s"] == (0, ["s"])


def test_shortest_paths_match_python_reference(spark):
    from morra_spark.operators.components import shortest_paths

    rng = random.Random(31)
    edges = sorted({(f"v{rng.randrange(14)}", f"v{rng.randrange(14)}")
                    for _ in range(25)})
    edges = [(a, b) for a, b in edges if a != b]
    seeds = ["v0", "v7"]
    got = {r.node: (r.hops, list(r.path))
           for r in shortest_paths(
               spark.createDataFrame(edges, ["src", "dst"]),
               spark.createDataFrame([(s,) for s in seeds], ["node"]),
               k=4).collect()}
    want = {n: (h, p) for n, (h, p) in
            _py_shortest_paths(edges, seeds, 4).items()}
    assert got == want
    # and the same on any partitioning
    rep = {r.node: (r.hops, list(r.path))
           for r in shortest_paths(
               spark.createDataFrame(edges, ["src", "dst"]).repartition(9),
               spark.createDataFrame([(s,) for s in seeds], ["node"]),
               k=4).collect()}
    assert rep == got


def test_shortest_paths_every_witness_is_a_real_path(spark):
    from morra_spark.operators.components import shortest_paths

    rng = random.Random(37)
    edges = sorted({(f"v{rng.randrange(12)}", f"v{rng.randrange(12)}")
                    for _ in range(20)})
    edges = [(a, b) for a, b in edges if a != b]
    sym = set(edges) | {(b, a) for a, b in edges}
    out = shortest_paths(
        spark.createDataFrame(edges, ["src", "dst"]),
        spark.createDataFrame([("v1",)], ["node"]), k=3).collect()
    for r in out:
        assert len(r.path) == r.hops + 1
        assert r.path[0] == "v1" and r.path[-1] == r.node
        for u, v in zip(r.path, r.path[1:]):
            assert (u, v) in sym


# ------------------------------------------------- HITS hubs/authorities

def _py_hits(edges, iters=10):
    """Plain-Python power iteration replaying hits_scores exactly."""
    import math

    es = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for e in es for x in e})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 0.0 for n in nodes}
    for _ in range(iters):
        auth = {n: 0.0 for n in nodes}
        for u, v in es:
            auth[v] += hub[u]
        norm = math.sqrt(sum(x * x for x in auth.values()))
        auth = {n: x / norm for n, x in auth.items()}
        hub = {n: 0.0 for n in nodes}
        for u, v in es:
            hub[u] += auth[v]
        norm = math.sqrt(sum(x * x for x in hub.values()))
        hub = {n: x / norm for n, x in hub.items()}
    return hub, auth


def test_hits_hand_case_roles_split(spark):
    """u cites three targets, w cites one; a is doubly-cited. Hub(u) >
    hub(w) > 0, authority(a) > authority(b) = authority(c); pure
    targets have hub 0.0 and pure sources authority 0.0 — defined
    rows, not missing ones."""
    from morra_spark.operators.components import hits_scores

    edges = [("u", "a"), ("u", "b"), ("u", "c"), ("w", "a")]
    got = {r.node: (r.hub, r.authority)
           for r in hits_scores(
               spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert set(got) == {"u", "w", "a", "b", "c"}
    assert got["u"][0] > got["w"][0] > 0
    assert got["a"][1] > got["b"][1] > 0
    assert got["b"][1] == got["c"][1]
    assert got["a"][0] == 0.0 and got["b"][0] == 0.0  # never a source
    assert got["u"][1] == 0.0 and got["w"][1] == 0.0  # never a target


def test_hits_matches_python_reference_and_partition_invariance(spark):
    from morra_spark.operators.components import hits_scores

    rng = random.Random(31)
    edges = sorted({(f"v{rng.randrange(12)}", f"v{rng.randrange(12)}")
                    for _ in range(30)})
    edges = [(a, b) for a, b in edges if a != b]
    hub, auth = _py_hits(edges, iters=10)
    df = spark.createDataFrame(edges, ["src", "dst"])
    for frame in (df, df.repartition(7)):
        got = {r.node: (r.hub, r.authority)
               for r in hits_scores(frame, iters=10).collect()}
        assert set(got) == set(hub)
        for n in hub:
            assert got[n][0] == pytest.approx(hub[n], abs=2e-6)
            assert got[n][1] == pytest.approx(auth[n], abs=2e-6)


def test_hits_bipartite_symmetry_and_l2_norm(spark):
    """Complete 2x2 bipartite: both sources share one hub score, both
    targets one authority score, and each side L2-normalizes to 1."""
    from morra_spark.operators.components import hits_scores

    edges = [("s1", "t1"), ("s1", "t2"), ("s2", "t1"), ("s2", "t2")]
    got = {r.node: (r.hub, r.authority)
           for r in hits_scores(
               spark.createDataFrame(edges, ["src", "dst"])).collect()}
    assert got["s1"] == got["s2"] and got["t1"] == got["t2"]
    assert got["s1"][0] == pytest.approx(2 ** -0.5, abs=1e-6)
    assert got["t1"][1] == pytest.approx(2 ** -0.5, abs=1e-6)
    assert got["s1"][1] == 0.0 and got["t1"][0] == 0.0


def test_hits_empty_and_degenerate_inputs(spark):
    """Self-loops/nulls are canonicalization noise; a fully-degenerate
    input yields an empty result with the right schema, and iters < 1
    raises instead of silently returning init scores."""
    from morra_spark.operators.components import hits_scores

    noise = spark.createDataFrame([("a", "a"), (None, "b"), ("c", None)],
                                  "src string, dst string")
    out = hits_scores(noise)
    assert out.columns == ["node", "hub", "authority"]
    assert out.count() == 0
    with pytest.raises(ValueError, match="iters"):
        hits_scores(noise, iters=0)


# ------------------------------------------------ link-pred benchmark

def _py_holdout(edges, seed, frac):
    """Replay the runner's portable-md5 edge split."""
    import hashlib

    out = set()
    for x, y in edges:
        h = int(hashlib.md5(
            f"{seed}|{x}|{y}".encode()).hexdigest()[:15], 16)
        if h % 1_000_000 < int(frac * 1_000_000):
            out.add((x, y))
    return out


def test_linkpred_benchmark_clique_perfect_recovery(spark):
    """On a clique every non-edge of the train graph IS a held-out
    edge, and every held-out pair keeps common neighbors — so
    coverage is 1.0 and every positive ranks first: mrr = hits_1 = 1.
    The split must replay the Python md5 reference exactly."""
    from morra_spark.plans.linkpred import run_linkpred_benchmark

    nodes = [f"n{i}" for i in range(6)]
    clique = [(a, b) for a in nodes for b in nodes if a < b]
    df = spark.createDataFrame(clique, "src string, dst string")
    s = run_linkpred_benchmark(df, holdout_frac=0.25, seed=13)
    want_test = _py_holdout(clique, 13, 0.25)
    assert s["n_test"] == len(want_test) > 0
    assert s["n_train"] == len(clique) - len(want_test)
    assert s["coverage"] == 1.0
    assert s["n_pos"] == 2 * s["n_test_reachable"]  # both endpoints
    assert s["mrr"] == 1.0 and s["hits_1"] == 1.0


def test_linkpred_benchmark_determinism_and_coverage_honesty(spark):
    """Same input, any partitioning -> identical summary; held-out
    edges beyond distance 2 of the train graph are reported as
    uncovered, never silently dropped."""
    from morra_spark.plans.linkpred import run_linkpred_benchmark

    rng = random.Random(41)
    edges = sorted({(f"v{rng.randrange(10)}", f"v{rng.randrange(10)}")
                    for _ in range(24)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    s1 = run_linkpred_benchmark(df, holdout_frac=0.3, seed=7)
    s2 = run_linkpred_benchmark(df.repartition(5), holdout_frac=0.3,
                                seed=7)
    assert s1 == s2
    assert 0 <= s1["n_test_reachable"] <= s1["n_test"]
    assert s1["n_train"] + s1["n_test"] == s1["n_edges"]
    # a chain's interior edge held out leaves its endpoints at
    # distance 2 ONLY via a common neighbor; an isolated held-out
    # bridge has none -> coverage must reflect it
    bridge = [("a", "b"), ("c", "d"), ("b", "c")]
    sb = run_linkpred_benchmark(
        spark.createDataFrame(bridge, "src string, dst string"),
        holdout_frac=0.999999, seed=1)
    assert sb["n_test"] == 3 and sb["n_test_reachable"] == 0
    assert sb["coverage"] == 0.0 and sb["n_pos"] == 0


def test_linkpred_benchmark_validates_inputs(spark):
    from morra_spark.plans.linkpred import run_linkpred_benchmark

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="holdout_frac"):
        run_linkpred_benchmark(df, holdout_frac=1.5)
    with pytest.raises(ValueError, match="score_col"):
        run_linkpred_benchmark(df, score_col="pagerank")


def test_ranking_metrics_filtered_excludes_sibling_positives(spark):
    """Raw protocol: two positives at ranks 1 and 3 (a negative
    between) -> mrr (1 + 1/3)/2; filtered: the second positive ignores
    the first, rank 3-1=2 -> mrr (1 + 1/2)/2. Hits_1 unchanged."""
    from morra_spark.plans.evaluate import ranking_metrics

    rows = [("q", "p1", 9.0, True), ("q", "n1", 5.0, False),
            ("q", "p2", 3.0, True), ("q", "n2", 1.0, False)]
    df = spark.createDataFrame(
        rows, "query string, cand string, score double, is_pos boolean")
    kw = dict(query_cols=("query",), cand_col="cand", ks=(1, 3))
    raw = ranking_metrics(df, **kw).first()
    filt = ranking_metrics(df, filtered=True, **kw).first()
    assert raw.mrr == pytest.approx((1 + 1 / 3) / 2)
    assert filt.mrr == pytest.approx((1 + 1 / 2) / 2)
    assert raw.hits_1 == filt.hits_1 == 0.5
    assert filt.hits_3 == 1.0


def test_hits_weighted_by_corroboration(spark):
    """weight_col: trust scales with supporting-triple count — a source
    asserting one heavily-corroborated edge outranks a source fanning
    out across many singletons; multi-edges fold by sum; the default
    stays the classic unweighted form (duplicates collapse to one unit
    edge). Python power-iteration reference with weights."""
    import math

    from morra_spark.operators.components import hits_scores

    # u asserts ONE heavily-corroborated edge (weight 9); w fans out
    # over singletons, one of them sharing u's authority so the graph
    # stays connected and hub mass can't fully concentrate on u
    rows = [("u", "a", 9.0), ("w", "a", 1.0), ("w", "b", 1.0),
            ("w", "c", 1.0)]
    df = spark.createDataFrame(rows, "src string, dst string, wt double")
    got = {r.node: (r.hub, r.authority)
           for r in hits_scores(df, weight_col="wt").collect()}
    assert got["u"][0] > got["w"][0] > 0      # corroboration beats fan-out
    assert got["a"][1] > got["b"][1] > 0
    # Python replay (same normalization scheme)
    nodes = sorted({x for r in rows for x in r[:2]})
    hub = {n: 1.0 for n in nodes}
    for _ in range(10):
        auth = {n: 0.0 for n in nodes}
        for s, d, wt in rows:
            auth[d] += wt * hub[s]
        nz = math.sqrt(sum(x * x for x in auth.values()))
        auth = {n: x / nz for n, x in auth.items()}
        hub = {n: 0.0 for n in nodes}
        for s, d, wt in rows:
            hub[s] += wt * auth[d]
        nz = math.sqrt(sum(x * x for x in hub.values()))
        hub = {n: x / nz for n, x in hub.items()}
    for n in nodes:
        assert got[n][0] == pytest.approx(hub[n], abs=2e-6)
        assert got[n][1] == pytest.approx(auth[n], abs=2e-6)
    # multi-edge fold: two weight-2 assertions of the same edge == one
    # weight-4 edge
    two = spark.createDataFrame([("u", "a", 2.0), ("u", "a", 2.0),
                                 ("w", "b", 4.0)],
                                "src string, dst string, wt double")
    one = spark.createDataFrame([("u", "a", 4.0), ("w", "b", 4.0)],
                                "src string, dst string, wt double")
    assert ({r.node: (r.hub, r.authority)
             for r in hits_scores(two, weight_col="wt").collect()}
            == {r.node: (r.hub, r.authority)
                for r in hits_scores(one, weight_col="wt").collect()})


def test_pagerank_and_ppr_weighted_transitions(spark):
    """weight_col: transition mass is corroboration-proportional
    (weight/sum of source weights, multi-edges folded) — on a star
    where one spoke carries 9x the weight, that spoke outranks the
    others; weighted PPR conserves total mass like the uniform form;
    the default path stays byte-identical to the historical uniform
    1/deg (graph_pagerank oracle re-verified)."""
    from morra_spark.operators.components import (pagerank_fixed,
                                                  personalized_pagerank)

    rows = [("hub", "a", 9.0), ("hub", "b", 1.0), ("hub", "c", 1.0)]
    df = spark.createDataFrame(rows, "src string, dst string, wt double")
    pr = {r.node: r.pr
          for r in pagerank_fixed(df, weight_col="wt",
                                  round_to=9).collect()}
    assert pr["a"] > pr["b"] and pr["b"] == pr["c"]
    # python replay, 3 iters, symmetrized weighted transitions
    nodes = ["hub", "a", "b", "c"]
    trans = {("hub", "a"): 9 / 11, ("hub", "b"): 1 / 11,
             ("hub", "c"): 1 / 11,
             ("a", "hub"): 1.0, ("b", "hub"): 1.0, ("c", "hub"): 1.0}
    r = {n: 1 / 4 for n in nodes}
    for _ in range(3):
        nxt = {n: 0.15 / 4 for n in nodes}
        for (u, v), w in trans.items():
            nxt[v] += 0.85 * r[u] * w
        r = nxt
    for n in nodes:
        assert pr[n] == pytest.approx(r[n], abs=1e-7)

    ppr = {row.node: row.ppr for row in personalized_pagerank(
        df, spark.createDataFrame([("hub",)], ["node"]),
        weight_col="wt", iters=4, round_to=12).collect()}
    assert ppr["a"] > ppr["b"] and sum(ppr.values()) == pytest.approx(
        1.0, abs=1e-9)

    # unweighted call ignores duplicate assertions (historical contract)
    dup = spark.createDataFrame(
        [("hub", "a", 1.0), ("hub", "a", 1.0), ("hub", "b", 1.0),
         ("hub", "c", 1.0)], "src string, dst string, wt double")
    assert ({r.node: r.pr for r in pagerank_fixed(dup).collect()}
            == {r.node: r.pr for r in pagerank_fixed(
                dup.dropDuplicates()).collect()})


def test_weighted_graph_ops_degenerate_weights(spark):
    """code-review r5 ANSI edge cases: self-loops keep weight-
    proportional (not doubled) transition mass; null / non-positive
    weights contribute nothing instead of zeroing a degree sum or an
    L2 norm and dividing by it; an all-degenerate weight column yields
    the empty result, not a crash."""
    from morra_spark.operators.components import (hits_scores,
                                                  pagerank_fixed,
                                                  personalized_pagerank)

    # self-loop: (x,x,1) + (x,y,1) -> x's out-mass splits 1/2, 1/2
    loop = spark.createDataFrame([("x", "x", 1.0), ("x", "y", 1.0)],
                                 "src string, dst string, wt double")
    pr_w = {r.node: r.pr for r in pagerank_fixed(
        loop, weight_col="wt", round_to=9).collect()}
    pr_u = {r.node: r.pr for r in pagerank_fixed(loop,
                                                 round_to=9).collect()}
    assert pr_w == pr_u  # equal weights == the uniform form, loop incl.

    # zero/null weights are ignored, not divided by
    mixed = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 0.0), ("z", "q", 0.0),
         ("b", "c", None)],
        "src string, dst string, wt double")
    pr = {r.node: r.pr for r in pagerank_fixed(mixed,
                                               weight_col="wt").collect()}
    assert set(pr) == {"a", "b"}  # only the positive-weight edge's ends
    ppr = personalized_pagerank(
        mixed, spark.createDataFrame([("a",)], ["node"]),
        weight_col="wt")
    assert {r.node for r in ppr.collect()} <= {"a", "b"}
    h = {r.node for r in hits_scores(mixed, weight_col="wt").collect()}
    assert h == {"a", "b"}

    # ALL-degenerate weights: empty result with the right schema
    dead = spark.createDataFrame([("a", "b", 0.0), ("b", "c", None)],
                                 "src string, dst string, wt double")
    out = hits_scores(dead, weight_col="wt")
    assert out.columns == ["node", "hub", "authority"]
    assert out.count() == 0
