"""Random-walk corpus generator (operators/walks.py): exact replay
against a plain-Python md5 reference, determinism/partitioning
invariance, edge validity, directed dead-ends, the hub cap, and the
map-only skip-gram pair aggregate."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _py_walks(edges, *, walk_length, walks_per_node, seed,
              directed=False):
    """Plain-Python replay of random_walks' portable-md5 picks."""
    es = set()
    for a, b in edges:
        es.add((a, b))
        if not directed:
            es.add((b, a))
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    adj = {k: sorted(v) for k, v in adj.items()}
    out = {}
    for node in adj:
        for rep in range(walks_per_node):
            wid = f"{node}#{rep}"
            path, cur = [node], node
            for step in range(1, walk_length):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = int(hashlib.md5(
                    f"{seed}|{wid}|{step}".encode()).hexdigest()[:15], 16)
                cur = nbrs[h % len(nbrs)]
                path.append(cur)
            out[wid] = path
    return out


def _rand_edges(seed, n_nodes=12, n_edges=30):
    rng = random.Random(seed)
    return sorted({(f"v{rng.randrange(n_nodes)}",
                    f"v{rng.randrange(n_nodes)}")
                   for _ in range(n_edges)})


def test_walks_match_python_reference(spark):
    from morra_spark.operators.walks import random_walks

    edges = [(a, b) for a, b in _rand_edges(3) if a != b]
    got = {r.walk_id: list(r.path)
           for r in random_walks(
               spark.createDataFrame(edges, ["src", "dst"]),
               walk_length=8, walks_per_node=2, seed=7).collect()}
    assert got == _py_walks(edges, walk_length=8, walks_per_node=2, seed=7)


def test_walks_directed_reference_and_dead_end(spark):
    from morra_spark.operators.walks import random_walks

    edges = [("a", "b"), ("b", "c")]  # c is a sink
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.walk_id: list(r.path)
           for r in random_walks(df, walk_length=6, walks_per_node=1,
                                 seed=1, directed=True).collect()}
    assert got == _py_walks(edges, walk_length=6, walks_per_node=1,
                            seed=1, directed=True)
    assert got["a#0"] == ["a", "b", "c"]  # stops at the sink, no nulls
    assert "c#0" not in got  # sinks start no walk


def test_walks_partitioning_invariant_and_seed_sensitive(spark):
    from morra_spark.operators.walks import random_walks

    edges = [(a, b) for a, b in _rand_edges(5) if a != b]
    df = spark.createDataFrame(edges, ["src", "dst"])
    ref = {r.walk_id: list(r.path)
           for r in random_walks(df, walk_length=10, seed=7).collect()}
    rep = {r.walk_id: list(r.path)
           for r in random_walks(df.repartition(13), walk_length=10,
                                 seed=7).collect()}
    assert rep == ref
    other = {r.walk_id: list(r.path)
             for r in random_walks(df, walk_length=10, seed=8).collect()}
    assert other != ref  # the seed actually steers the picks


def test_every_step_is_an_edge_and_counts_line_up(spark):
    from morra_spark.operators.walks import random_walks

    edges = [(a, b) for a, b in _rand_edges(9) if a != b]
    sym = set(edges) | {(b, a) for a, b in edges}
    nodes = {a for a, _ in sym}
    walks = random_walks(spark.createDataFrame(edges, ["src", "dst"]),
                         walk_length=12, walks_per_node=3,
                         seed=2).collect()
    assert len(walks) == 3 * len(nodes)
    for r in walks:
        # symmetrized + connected-enough: never a dead end mid-walk
        assert len(r.path) == 12 and r.path[0] == r.start
        for u, v in zip(r.path, r.path[1:]):
            assert (u, v) in sym


def test_max_degree_caps_the_neighbor_pool(spark):
    from morra_spark.operators.walks import random_walks

    star = [("hub", f"leaf{i}") for i in range(10)]
    df = spark.createDataFrame(star, ["src", "dst"])
    walks = random_walks(df, walk_length=2, walks_per_node=40, seed=3,
                         max_degree=3).collect()
    hub_next = {r.path[1] for r in walks if r.start == "hub"}
    assert len(hub_next) <= 3  # picks confined to the capped sample
    again = random_walks(df, walk_length=2, walks_per_node=40, seed=3,
                         max_degree=3).collect()
    assert ({r.walk_id: list(r.path) for r in walks}
            == {r.walk_id: list(r.path) for r in again})


def test_skipgram_pairs_hand_computed(spark):
    from morra_spark.operators.walks import walk_skipgram_pairs

    walks = spark.createDataFrame(
        [("w0", ["a", "b", "c", "a"])], "walk_id string, path array<string>")
    got = {(r.center, r.context): r.n
           for r in walk_skipgram_pairs(walks, window=2).collect()}
    # forward pairs within 2: (a,b) (a,c) (b,c) (b,a) (c,a) — then both
    # directions; (a,b): fwd a->b once + b->a's reverse once = 2, etc.
    want_fwd = {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
                ("b", "a"): 1, ("c", "a"): 1}
    want = {}
    for (u, v), n in want_fwd.items():
        want[(u, v)] = want.get((u, v), 0) + n
        want[(v, u)] = want.get((v, u), 0) + n
    assert got == want
    # symmetry is structural: counts match transposed
    assert all(got[(b, a)] == n for (a, b), n in got.items())


def test_skipgram_plan_is_maponly_plus_one_aggregate(spark):
    """The pair generator must stay join-free (the path array carries
    its own context — no self-join) with the count groupBy as the ONLY
    exchange (the test_plan_shape.py discipline applied locally)."""
    from morra_spark.operators.walks import walk_skipgram_pairs

    w = spark.createDataFrame([("w0", ["a", "b", "c"])],
                              "walk_id string, path array<string>")
    plan = (walk_skipgram_pairs(w)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Join") == 0
    assert plan.count("Exchange") == 1
