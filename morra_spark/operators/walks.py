"""Seeded random-walk corpus generation — the KG→embedding bridge.

DeepWalk-family node embeddings (and the skip-gram trainers behind
them) consume a corpus of truncated random walks: each walk is a
"sentence" whose tokens are node ids, and co-occurrence within a walk
window becomes the training signal. This module generates that corpus
distributively over the materialized graph (``kg_graph.graph_edges``
output, near-dup pair graphs, or any edge list).

Determinism is the design center, exactly like the repo's sampling /
negative-sampling operators: every neighbor pick is the engine-portable
md5 of ``seed|walk_id|step`` reduced mod degree — NOT an RNG. The same
(edges, seed) produce bit-identical walks on any partitioning, any
retry, any executor count, and a plain-Python reference can replay
every pick (pytest does). A walk corpus that changes under retries
would silently change the downstream embedding — the same argument as
``curation.split_assign``.

Uniform walks only (the node2vec p=q=1 case): the p/q-biased variant
needs the previous step's neighbor SET membership per candidate, which
turns each step's one equi-join into a join + array-contains over the
frontier — a real cost at hub nodes for a bias whose gains are
task-dependent. Documented out of scope rather than half-shipped.

100 TB shape: the adjacency is aggregated ONCE to (node, sorted
neighbor array) and localCheckpointed (the ``pagerank_fixed`` loop-
invariant discipline); each of the L-1 steps is then ONE equi-join of
the frontier against it (co-keyed on the current node) plus map-only
pick arithmetic — no window, no Python, no driver state. Hub-node
array blow-up (a 10^6-degree node would carry a 10^6-element array
through every join) is bounded by ``max_degree``: a deterministic
md5-ranked neighbor cap (the GraphSAGE neighbor-sampling standard;
rank by hash, not lexicographically, so the kept set is an unbiased
fixed sample). Path arrays are bounded by ``walk_length``. Lineage is
cut every few steps (eager localCheckpoint) so Catalyst analysis stays
linear in L instead of compounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _pick(walk_id: Column, step: int, seed: int, n: Column) -> Column:
    """Deterministic index in [0, n): 60-bit portable-md5 of
    ``seed|walk_id|step`` mod n (replayable as
    ``int(md5(...).hexdigest()[:15], 16) % n`` — pytest pins it)."""
    h = F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.lit(str(seed)), walk_id, F.lit(str(step)))), 1, 15),
        16, 10).cast("long")
    return (h % n.cast("long")).cast("int")


def random_walks(edges: DataFrame, *, walk_length: int = 10,
                 walks_per_node: int = 2, seed: int = 42,
                 src: str = "src", dst: str = "dst",
                 directed: bool = False, max_degree: int | None = None,
                 checkpoint_every: int = 8) -> DataFrame:
    """(src, dst) edges → ``(walk_id, start, path)`` walk corpus:
    ``walks_per_node`` walks of up to ``walk_length`` nodes from every
    node, each step a uniform (seeded, portable-md5) pick among the
    current node's neighbors. Undirected by default (edges
    symmetrized); in ``directed`` mode a walk reaching a sink node
    simply ends there (shorter path, never a null token). ``max_degree``
    caps each node's neighbor list to a deterministic md5-ranked sample
    before any walking — the standard hub-node bound for walk corpora.
    """
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not directed:
        e = e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    e = e.filter(F.col("a").isNotNull() & F.col("b").isNotNull()).distinct()
    if max_degree is not None:
        # hash-ranked cap: same exchange as the groupBy below (both key
        # on `a`), so the window costs no extra shuffle
        rk = F.row_number().over(
            Window.partitionBy("a").orderBy(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("a"),
                                  F.col("b"), F.lit("cap"))), "b"))
        e = e.withColumn("_rk", rk).filter(F.col("_rk") <= max_degree) \
            .drop("_rk")
    adj = (e.groupBy(F.col("a").alias("node"))
           .agg(F.sort_array(F.collect_set("b")).alias("nbrs"))
           .localCheckpoint(eager=True))  # loop invariant, reused L-1x

    walks = (adj.select("node")
             .select(F.col("node").alias("start"),
                     F.explode(F.sequence(
                         F.lit(0), F.lit(walks_per_node - 1))).alias("rep"))
             .select("start",
                     F.concat_ws("#", "start", "rep").alias("walk_id"),
                     F.array("start").alias("path"),
                     F.col("start").alias("cur")))
    for step in range(1, walk_length):
        stepped = (walks
                   .join(adj, walks["cur"] == adj["node"], "left")
                   .drop("node"))
        idx = _pick(F.col("walk_id"), step, seed, F.size("nbrs"))
        nxt = F.when(F.col("nbrs").isNotNull() & F.col("cur").isNotNull(),
                     F.element_at("nbrs", idx + 1))
        walks = (stepped
                 .select("start", "walk_id",
                         F.when(nxt.isNotNull(),
                                F.concat("path", F.array(nxt)))
                         .otherwise(F.col("path")).alias("path"),
                         nxt.alias("cur")))
        if step % checkpoint_every == 0:
            walks = walks.localCheckpoint(eager=True)
    return walks.select("walk_id", "start", "path")


def walk_skipgram_pairs(walks: DataFrame, *, window: int = 2,
                        path_col: str = "path") -> DataFrame:
    """Walk corpus → aggregated skip-gram co-occurrence pairs
    ``(center, context, n)``: every ordered pair of nodes at distance
    1..window inside a walk, both directions, counted corpus-wide —
    the input grain a word2vec-style trainer (or a PMI factorization)
    consumes directly.

    Shape: MAP-ONLY pair generation — posexplode each path, slice the
    SAME row's path array for the ≤``window`` forward neighbors (no
    self-join: the path already carries its own context), emit each
    forward pair in both orders, then one partial-aggregating groupBy.
    Per-row fan-out is exactly min(window, remaining path) ≤ window —
    an explicit small constant — and the only shuffle is the final
    count aggregate on (center, context)."""
    toks = walks.select(F.col(path_col).alias("_p"),
                        F.posexplode(path_col).alias("i", "center"))
    fwd = (toks
           .select("center", F.explode(
               F.slice("_p", F.col("i") + 2, window)).alias("context")))
    both = fwd.unionByName(
        fwd.select(F.col("context").alias("center"),
                   F.col("center").alias("context")))
    return (both.groupBy("center", "context")
            .agg(F.count(F.lit(1)).alias("n")))
