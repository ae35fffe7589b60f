"""Connected components over near-dup candidate pairs — dedup clustering.

Pairwise near-dup detection (MinHash/LSH, n-gram Jaccard, phash — see
``operators/dedup.py``) emits EDGES; a production dedup pass needs the
CLUSTERS those edges imply (doc A ~ B and B ~ C must collapse to one
survivor even when A ~ C was never scored). This module closes that gap:
``connected_components`` labels every endpoint with the minimum doc id
of its component, and ``dedup_survivors`` derives the keep-list.

Algorithm: iterative **min-label propagation with pointer jumping**
(the halving step of classic PRAM/MapReduce connected-components — cf.
Kiveris et al., "Connected Components in MapReduce and Beyond", the
large-star/small-star family). Each round:

1. propagate — every node takes ``min(label, min(labels of neighbors))``
   (one join edge⋈label + one partial-aggregating groupBy);
2. compress — pointer jumping: ``label(v) := label(label(v))`` (one
   self-join), which makes label trees halve in height each round.

Convergence is O(log D) rounds for diameter-D components (pointer
jumping, not D rounds of plain propagation — a 10^6-doc duplicate chain
converges in ~20 rounds, not 10^6). The per-round convergence check is a
single scalar ``count`` of changed labels — a driver-side scalar read,
not a collect of data rows.

Each round ends with ``localCheckpoint(eager=True)``, NOT ``persist``:
``prop`` feeds the compress self-join twice, so without lineage
truncation the logical plan DOUBLES per round and Catalyst re-analysis
goes exponential (measured: the loop wedges around round ~10 on a
64-node path). Checkpointing cuts the plan back to a leaf each round —
the standard iterative-algorithm discipline on Spark (same reason
GraphFrames/GraphX checkpoint their Pregel loops).

100 TB shape: every step is an equi-join/groupBy on node id — hash-
partitioned, partial-aggregated, no driver state beyond the loop
counter; edge and label tables stay distributed throughout. Skewed
hub nodes (a template document near-dup to millions) partial-aggregate
map-side in the propagate groupBy. Persist/unpersist per round keeps
lineage short (without it the plan doubles every iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonicalize an undirected edge list to the simple-graph form
    every audit operator here assumes: null endpoints and self-loops
    dropped, each edge once as ``(x, y)`` with ``x < y``
    (least/greatest), duplicates collapsed. One shared definition so a
    canonicalization change can never silently diverge the graph that
    ``triangle_count`` / ``kcore`` / ``link_scores`` /
    ``clustering_coefficient`` each see.
    """
    a, b = F.col(src), F.col(dst)
    return (edges.filter(a.isNotNull() & b.isNotNull() & (a != b))
            .select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
            .distinct())


def connected_components(pairs: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """(src, dst) undirected edge pairs → (node, component) labels.

    ``component`` is the minimum node id in the node's connected
    component. Only nodes appearing in ``pairs`` are labeled (isolated
    docs have no dedup decision to make). Deterministic for any input
    order. Raises if ``max_iter`` rounds don't converge (pointer
    jumping needs ~log2(max component diameter) rounds; 25 covers
    components of diameter ~2^25).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # localCheckpoint, deliberately NOT the persisted pre-partitioned
    # cache hits_scores uses: measured on the bench's curation_funnel
    # (CC is its hottest loop), the per-round columnar cache decode
    # costs more than the exchange it saves at local scale — funnel
    # 12.8 s checkpointed vs 26.9 s cached, A/B'd round-5. The cluster
    # tradeoff (network shuffle vs local decode) is documented on
    # hits_scores and in SCALE.md.
    edges = e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b"))) \
        .distinct().localCheckpoint(eager=True)
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("comp", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        # 1) propagate: min neighbor label per node (the pre-round label
        # rides along as `old` so convergence needs no join-back)
        nbr_min = (edges
                   .join(labels.select(F.col("node").alias("b"),
                                       F.col("comp").alias("comp_b")),
                         "b")
                   .groupBy("a").agg(F.min("comp_b").alias("nbr")))
        prop = (labels
                .join(nbr_min.withColumnRenamed("a", "node"),
                      "node", "left")
                .select("node", F.col("comp").alias("old"),
                        F.least("comp", F.coalesce("nbr", "comp"))
                        .alias("comp")))
        # 2) compress (pointer jumping): comp := comp(comp)
        parent = prop.select(F.col("node").alias("comp"),
                             F.col("comp").alias("comp_parent"))
        new = (prop.join(parent, "comp", "left")
               .select("node", F.coalesce("comp_parent", "comp")
                       .alias("comp"), "old")
               .localCheckpoint(eager=False))  # truncate lineage — see
        # module docstring: without this the plan doubles every round.
        # eager=False: the convergence count below is the materializing
        # action, so each round runs ONE Spark job, not two.
        changed = new.filter(F.col("comp") != F.col("old")).count()
        labels = new.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def _degree_normalized_edges(pairs: DataFrame, src: str, dst: str,
                             weight_col: str | None) -> DataFrame:
    """Shared wedge-prep for the PageRank family: symmetrized edge list
    with per-source transition mass ``w``. Unweighted (default): the
    historical distinct-edges / 1-per-degree form (oracle-pinned
    byte-identical). Weighted: multi-edge weights fold by sum and each
    edge carries weight/Σ(source weights) — corroboration-proportional
    transition probability (the weighted-HITS rule); null and
    non-positive weights contribute nothing (dropped BEFORE the degree
    sum, so a node whose weights all floor to zero can never produce a
    divide-by-zero under ANSI — code-review r5). One definition so the
    two PageRank variants can never silently diverge (the _rule_bodies
    argument)."""
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                     (F.col(weight_col).cast("double")
                      if weight_col is not None
                      else F.lit(1.0)).alias("_w"))
    if weight_col is not None:
        e = e.filter(F.col("_w") > 0)
    # symmetrize WITHOUT re-emitting self-loops: the unweighted
    # distinct() collapsed the duplicate, but the weighted groupBy-sum
    # would double a self-loop's mass (code-review r5)
    sym = e.unionByName(e.filter(F.col("a") != F.col("b"))
                        .select(F.col("b").alias("a"),
                                F.col("a").alias("b"), "_w"))
    if weight_col is None:
        edges = sym.select("a", "b").distinct()
        deg = edges.groupBy("a").agg(F.count(F.lit(1)).alias("_t"))
    else:
        edges = sym.groupBy("a", "b").agg(F.sum("_w").alias("_w"))
        deg = edges.groupBy("a").agg(F.sum("_w").alias("_t"))
    w = (F.col("_w") / F.col("_t")) if weight_col is not None \
        else (F.lit(1.0) / F.col("_t"))
    return edges.join(deg, "a").select("a", "b", w.alias("w"))


def pagerank_fixed(pairs: DataFrame, src: str = "src", dst: str = "dst",
                   iters: int = 3, damping: float = 0.85,
                   round_to: int = 5,
                   weight_col: str | None = None) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge set —
    (node, pr) after ``iters`` synchronous power iterations with uniform
    init 1/N and damping ``(1-d)/N + d·Σ pr(u)/deg(u)``.

    Centrality over the KG / near-dup graph ranks canonical candidates
    and surfaces hub entities. ``weight_col`` makes the transition mass
    corroboration-proportional (weight/Σ source weights, multi-edges
    folded by sum — the weighted-HITS rule); the default stays the
    historical uniform 1/deg form, oracle-pinned byte-identical. A FIXED iteration count keeps the whole
    computation SQL-expressible: the DuckDB oracle unrolls the same
    ``iters`` levels as chained CTEs and must reproduce every rank
    bit-for-bit (after rounding to ``round_to`` decimals, absorbing
    summation-order float noise).

    100 TB shape: degrees are folded into the edge list ONCE
    (``weight = 1/deg(src)``), so each iteration is exactly one
    equi-join (edges ⋈ ranks on src) + one partial-aggregating
    groupBy(dst) — no window, no driver state, no per-iteration degree
    recompute. The weighted edge list is the loop invariant: it is
    localCheckpointed once and reused, and with a handful of fixed
    iterations the rank lineage stays shallow (an open-ended variant
    would checkpoint per round like ``connected_components``).
    Symmetrized input means no dangling nodes, so total mass is
    conserved without a dangling-redistribution term.
    """
    wedges = (_degree_normalized_edges(pairs, src, dst, weight_col)
              .localCheckpoint(eager=True))
    n = wedges.select("a").distinct().count()
    ranks = (wedges.select("a").distinct()
             .withColumn("pr", F.lit(1.0 / n)))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (wedges.join(ranks, "a")
                   .groupBy("b")
                   .agg(F.sum(F.col("pr") * F.col("w")).alias("mass")))
        ranks = contrib.select(
            F.col("b").alias("a"),
            (F.lit(base) + F.lit(damping) * F.col("mass")).alias("pr"))
    return ranks.select(F.col("a").alias("node"),
                        F.round("pr", round_to).alias("pr"))


def personalized_pagerank(pairs: DataFrame, seeds: DataFrame,
                          src: str = "src", dst: str = "dst",
                          seed_col: str = "node", iters: int = 5,
                          damping: float = 0.85, round_to: int = 6,
                          weight_col: str | None = None) -> DataFrame:
    """Personalized PageRank — ``(node, ppr)`` relatedness scores with
    the restart mass concentrated on ``seeds`` instead of spread
    uniformly: the standard "entities related to X" serving primitive
    (RAG context ranking beyond raw hop distance, link-prediction
    candidate scoring, query expansion). ``khop_reach`` answers *how
    far*; this answers *how strongly connected*, which differs exactly
    when multiple short paths reinforce each other. ``weight_col``
    (like ``pagerank_fixed``) makes transitions corroboration-
    proportional — the better serving default on the KG edges table,
    where edge weight counts supporting triples.

    Fixed synchronous iterations of
    ``r ← (1-d)·restart + d·(Wᵀ r)`` with restart uniform over the seed
    set, on the symmetrized degree-normalized graph. Unreached nodes
    carry no row (their rank after ``iters`` hops is exactly the
    (1-d)-share of zero). Symmetrized input means no dangling mass, so
    total rank conserves at 1 (pytest pins it) — with one documented
    exception: a seed that appears in NO edge leaks its damping share
    each iteration (it has nowhere to spread), leaving the total below
    1; seed from the graph's node set, as every caller here does.

    100 TB shape: identical loop skeleton to ``pagerank_fixed`` — the
    degree-folded weighted edge list is the checkpointed loop
    invariant; each iteration is ONE equi-join (edges ⋈ ranks on the
    source key) + one partial-aggregating groupBy, plus a unionByName
    of the constant seed-restart frame (no window, no driver state).
    The rank frontier only grows ``iters`` hops around the seeds, so a
    small seed set keeps every iteration's rank table a fraction of the
    node universe — the reason PPR (not global pagerank) is the serving
    primitive.
    """
    wedges = (_degree_normalized_edges(pairs, src, dst, weight_col)
              .localCheckpoint(eager=True))
    s = seeds.select(F.col(seed_col).alias("a")).distinct()
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    restart = (s.withColumn("_r0", F.lit(1.0 / n_seeds))
               .localCheckpoint(eager=True))
    ranks = restart.select("a", F.col("_r0").alias("pr"))
    for _ in range(iters):
        contrib = (wedges.join(ranks, "a")
                   .groupBy("b")
                   .agg(F.sum(F.col("pr") * F.col("w")).alias("mass")))
        spread = contrib.select(
            F.col("b").alias("a"),
            (F.lit(damping) * F.col("mass")).alias("pr"))
        hold = restart.select(
            "a", (F.lit(1.0 - damping) * F.col("_r0")).alias("pr"))
        ranks = (spread.unionByName(hold)
                 .groupBy("a").agg(F.sum("pr").alias("pr")))
    return ranks.select(F.col("a").alias("node"),
                        F.round("pr", round_to).alias("ppr"))


def _hits_round(e_part: DataFrame, scores: DataFrame, join_key: str,
                group_key: str) -> DataFrame:
    """One HITS half-round: the (persisted, pre-hash-partitioned on
    ``join_key``) weighted edge orientation ⋈ node scores,
    partial-aggregated to ``group_key`` grain (contribution = score ×
    edge weight; the unweighted caller carries w = 1.0). Factored out
    so the plan-shape suite can pin the scale property directly: the
    edge side must come straight off the InMemoryTableScan with NO
    Exchange — only the node-grain score side and the groupBy
    shuffle."""
    return (e_part.join(scores.withColumnRenamed("node", join_key),
                        join_key)
            .groupBy(F.col(group_key).alias("node"))
            .agg(F.sum(F.col("s") * F.col("w")).alias("s")))


def hits_scores(pairs: DataFrame, src: str = "src", dst: str = "dst",
                iters: int = 10, round_to: int = 6,
                weight_col: str | None = None) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg's hubs & authorities) over the
    DIRECTED edge set — ``(node, hub, authority)`` after ``iters``
    synchronous mutual-reinforcement rounds with per-round L2
    normalization.

    Why next to ``pagerank_fixed``: PageRank runs on the symmetrized
    graph and answers "how central"; HITS keeps direction and splits
    centrality into the two roles a subj→obj KG actually has —
    AUTHORITIES (entities many well-sourced subjects point at: the
    canonical targets knowledge fusion should trust) vs HUBS (subjects
    asserting many well-corroborated facts: prolific sources — or, at
    pathological hub score with low per-edge corroboration, the
    extraction-error magnets worth sampling). On a near-dup candidate
    graph the split is degenerate (symmetric edges ⇒ hub ≡ authority);
    it earns its keep on the KG's directed edges.

    Semantics (the classic power iteration):
    * init hub = authority = 1 for every node of the graph;
    * per round: ``auth(v) = Σ_{u→v} w(u,v)·hub(u)`` then
      L2-normalize; ``hub(u) = Σ_{u→v} w(u,v)·auth(v)`` (the fresh
      auths) then L2-normalize. ``weight_col`` supplies w (the KG
      edges table's ``weight`` = supporting-triple count, so trust
      scales with corroboration — multi-edges fold by sum, null
      weights contribute nothing); default w = 1 is the classic
      unweighted form;
    * nodes with no in-edges get authority 0.0, no out-edges hub 0.0 —
      defined rows, never dropped, so downstream joins need no
      special case.
    Deterministic up to float-summation order, absorbed by rounding to
    ``round_to`` at the END (the ``pagerank_fixed`` rule — like
    pagerank, a score sitting exactly on a rounding boundary may in
    principle differ in the last decimal across partitionings; the
    integer-quantized fold link_scores uses is not worth its overflow
    bookkeeping here, where the consumer ranks rather than diffs); a
    FIXED iteration count keeps re-runs stable (10 rounds is well past
    ranking stability on audit-sized graphs — pytest pins a hand case
    and a Python power-iteration reference).

    100 TB shape: each round is TWO co-keyed equi-joins (edges ⋈ hub
    on the source key, edges ⋈ auth on the target key) + two
    partial-aggregating groupBys — no window, no Python, hub keys
    combine map-side. The loop-invariant edge list is PERSISTED twice,
    pre-hash-partitioned on each join key (persist keeps
    outputPartitioning where localCheckpoint erases it — verified on
    the physical plan), so the BIG side of every join is exchange-free
    across all ``2·iters`` joins; only the round's score frame (node
    grain, small) shuffles. The L2 norm is a driver-side SCALAR read
    per round (the ``kcore`` convergence-count discipline — bounded,
    never a data collect); raw score frames are eagerly
    localCheckpointed per round so lineage stays flat, and the
    normalizing division is a lazy select stacked on the checkpoint.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    a, b = F.col(src), F.col(dst)
    e = (pairs.filter(a.isNotNull() & b.isNotNull() & (a != b))
         .select(a.alias("u"), b.alias("v"),
                 (F.col(weight_col).cast("double")
                  if weight_col is not None
                  else F.lit(1.0)).alias("w")))
    if weight_col is not None:
        # null / non-positive weights contribute nothing — and must be
        # dropped HERE: an all-zero (or all-null) weight column would
        # otherwise zero a round's L2 norm and divide by it (ANSI
        # DIVIDE_BY_ZERO / float(None) — code-review r5). A node whose
        # edges all carry such weights is not part of the effective
        # graph and carries no output row.
        e = e.filter(F.col("w") > 0)
    # unweighted: duplicates collapse to ONE unit edge (the historical
    # contract); weighted: multi-edge weights fold by sum (the
    # infer_node_types rule)
    edges = (e.select("u", "v").distinct().withColumn("w", F.lit(1.0))
             if weight_col is None
             else e.groupBy("u", "v").agg(F.sum("w").alias("w"))
             ).localCheckpoint(eager=True)
    nodes = (edges.select(F.col("u").alias("node"))
             .unionAll(edges.select(F.col("v").alias("node")))
             .distinct().localCheckpoint(eager=True))
    if edges.isEmpty():
        # no edges -> no norm scalar to divide by; empty result, right schema
        return nodes.select("node", F.lit(0.0).alias("hub"),
                            F.lit(0.0).alias("authority"))
    e_by_u = edges.repartition("u").persist()
    e_by_v = edges.repartition("v").persist()
    try:
        hub = nodes.select("node", F.lit(1.0).alias("s"))
        auth = None
        for _ in range(iters):
            # only the RAW aggregates materialize (one checkpoint
            # each); the normalizing division is a lazy select stacked
            # on the checkpointed frame — scaling a checkpoint would
            # waste a job
            raw_a = (_hits_round(e_by_u, hub, "u", "v")
                     .localCheckpoint(eager=True))
            n2 = raw_a.agg(F.sum(F.col("s") * F.col("s"))).first()[0]
            auth = raw_a.select("node", (F.col("s") / float(n2) ** 0.5)
                                .alias("s"))
            raw_h = (_hits_round(e_by_v, auth, "v", "u")
                     .localCheckpoint(eager=True))
            h2 = raw_h.agg(F.sum(F.col("s") * F.col("s"))).first()[0]
            hub = raw_h.select("node", (F.col("s") / float(h2) ** 0.5)
                               .alias("s"))
        return (nodes
                .join(hub.select("node", F.col("s").alias("_h")),
                      "node", "left")
                .join(auth.select("node", F.col("s").alias("_a")),
                      "node", "left")
                .select("node",
                        F.round(F.coalesce("_h", F.lit(0.0)), round_to)
                        .alias("hub"),
                        F.round(F.coalesce("_a", F.lit(0.0)), round_to)
                        .alias("authority"))
                # the result no longer references the persisted
                # orientations, so materialize before releasing them
                .localCheckpoint(eager=True))
    finally:
        e_by_u.unpersist()
        e_by_v.unpersist()


def khop_reach(pairs: DataFrame, seeds: DataFrame, k: int = 2,
               src: str = "src", dst: str = "dst",
               seed_col: str = "node") -> DataFrame:
    """Fixed-k BFS frontier expansion — the k-hop neighborhood extractor
    a KG serving layer runs to pull a query entity's local subgraph
    (RAG context assembly, link-prediction candidate generation, GNN
    sampling). Returns ``(node, hops)`` where ``hops`` is the MINIMUM
    hop distance (0..k) from any seed over the symmetrized edge set;
    nodes farther than ``k`` hops are absent.

    Algorithm: classic frontier BFS — per level, ONE equi-join
    (frontier ⋈ edges) + ONE distinct + ONE anti-join against the
    visited set. Correctness of ``hops`` as a true shortest-path
    distance falls out of frontier order: a node is claimed by the
    FIRST level that reaches it and the anti-join bars re-claims.

    A FIXED small ``k`` keeps the whole computation SQL-expressible
    (the DuckDB oracle unrolls the same k levels as chained CTEs with
    NOT-IN guards) and keeps lineage shallow — no per-round checkpoint
    needed, unlike the open-ended ``connected_components`` loop.

    100 TB shape: every step is a hash equi-join / distinct on node id
    — no windows, no driver state, no collect; the visited set stays
    distributed and grows monotonically. Hub-node fan-out is bounded by
    the per-level ``distinct`` (a neighbor reached via 10^6 parallel
    paths shuffles once per level, not 10^6 times, thanks to map-side
    partial aggregation of the distinct). For billion-edge graphs the
    frontier join partitioning (on ``a``) is reused level to level.
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b"))).distinct()
    visited = (seeds.select(F.col(seed_col).alias("node")).distinct()
               .withColumn("hops", F.lit(0)))
    frontier = visited.select("node")
    for level in range(1, k + 1):
        nxt = (frontier.join(edges, frontier["node"] == edges["a"])
               .select(F.col("b").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(level)))
        visited = visited.unionByName(nxt)
        frontier = nxt.select("node")
    return visited.select("node", F.col("hops").cast("int").alias("hops"))


def shortest_paths(pairs: DataFrame, seeds: DataFrame, k: int = 3,
                   src: str = "src", dst: str = "dst",
                   seed_col: str = "node") -> DataFrame:
    """Shortest paths with the PATH MATERIALIZED — ``(node, hops,
    path)`` for every node within ``k`` hops of a seed, where ``path``
    is an actual node sequence from a seed to the node. The
    explanation query behind "how are X and Y connected": ``khop_reach``
    returns the distance, this returns the witness an entity card / RAG
    answer can display.

    Deterministic path choice (engine/partitioning-invariant, the rule
    every tie in this repo follows): among all shortest paths to a
    node, the LEXICOGRAPHICALLY SMALLEST node sequence. That global
    minimum is computable level-locally — every shortest path to ``v``
    is (shortest path to an eligible predecessor) + [v], all the same
    length, so the lex-min over full sequences is the lex-min over
    predecessors' best paths — which is why one ``min`` aggregate per
    level suffices (arrays are orderable in Spark) and the result
    never depends on which equal-length path a partition saw first.

    100 TB shape: the ``khop_reach`` frontier loop (per level ONE
    equi-join + one min-groupBy + one anti-join, all hash-keyed on node
    id) with a path array ≤ k+1 ids riding along — state per node is
    bounded by the fixed small k, the same reason khop keeps lineage
    shallow without checkpoints. Not a general APSP: seeds-out only,
    by design (the closure materializes pair distances; this
    materializes a witness per reached node).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b"))).distinct()
    visited = (seeds.select(F.col(seed_col).alias("node")).distinct()
               .withColumn("hops", F.lit(0))
               .withColumn("path", F.array(F.col("node"))))
    frontier = visited.select("node", "path")
    for level in range(1, k + 1):
        nxt = (frontier.join(edges, frontier["node"] == edges["a"])
               .select(F.col("b").alias("node"),
                       F.concat("path", F.array(F.col("b"))).alias("path"))
               .groupBy("node")
               .agg(F.min("path").alias("path"))
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("hops", F.lit(level)))
        visited = visited.unionByName(nxt.select("node", "hops", "path"))
        frontier = nxt.select("node", "path")
    return visited.select("node", F.col("hops").cast("int").alias("hops"),
                          "path")


def transitive_closure(edges: DataFrame, src: str = "src",
                       dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """Directed reachability closure with exact minimum hop distance —
    ``(src, dst, dist)`` for every ordered pair connected by a directed
    path. The KG consumer's "is-a / part-of rollup": a hierarchy
    predicate's closure is what lets a query for ``region:EUROPE``
    match entities asserted three levels below it.

    Algorithm: **min-plus path doubling** (repeated squaring of the
    adjacency relation — cf. Valiant's parallel transitive closure /
    the APSP-by-matrix-squaring classic): each round joins the current
    path set with itself (``p1.dst == p2.src``), unions the composed
    paths in, and keeps ``min(dist)`` per pair. Paths of length up to
    2^k exist after k rounds, so a depth-D hierarchy closes in
    ⌈log2 D⌉ + 1 rounds (the +1 detects the empty anti-join) — a
    10^6-deep chain needs ~21, not 10^6 (the naive frontier
    expansion); the default ``max_iter`` of 25 covers depth ~2^24
    detection round included (code-review r5: the old default of 20
    was one round short of this docstring's own 10^6 example).
    Convergence = an empty anti-join (no new
    pair, no improved distance): distances only decrease and pairs are
    finite, so the loop also terminates on cyclic inputs (a cycle just
    yields ``(v, v, dist>0)`` rows). Raises past ``max_iter``.

    100 TB shape: every step is an equi-join + partial-aggregating
    min-groupBy on node-id keys — no windows, no driver state beyond
    the round counter and a scalar convergence count. Each round ends
    with ``localCheckpoint`` for the same reason as
    ``connected_components``: the self-join doubles the logical plan
    per round without it. NOTE the output is the closure itself — for
    a fan-out-heavy DAG that is inherently O(V·depth) rows; callers
    that only need "descendants of X" should seed ``khop_reach``
    instead of materializing the full closure.
    """
    paths = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
             .filter(F.col("src") != F.col("dst")).distinct()
             .withColumn("dist", F.lit(1).cast("long"))
             .localCheckpoint(eager=True))
    return _minplus_doubling(paths, max_iter, "transitive_closure")


def _minplus_doubling(paths: DataFrame, max_iter: int,
                      caller: str) -> DataFrame:
    """Shared min-plus path-doubling fixpoint: square the given
    ``(src, dst, dist)`` path relation (keeping min dist per pair) until
    a round adds no pair and improves no distance. The seed decides the
    semantics — dist-1 edges give the full closure; closure ∪ delta
    edges gives the incrementally extended closure (``extend_closure``).
    ``paths`` must already be lineage-truncated (the loop checkpoints
    each round)."""
    for _ in range(max_iter):
        left = paths.select(F.col("src"), F.col("dst").alias("mid"),
                            F.col("dist").alias("d1"))
        right = paths.select(F.col("src").alias("mid"), F.col("dst"),
                             F.col("dist").alias("d2"))
        composed = (left.join(right, "mid")
                    .select("src", "dst",
                            (F.col("d1") + F.col("d2")).alias("dist")))
        nxt = (paths.unionByName(composed)
               .groupBy("src", "dst")
               .agg(F.min("dist").alias("dist"))
               .localCheckpoint(eager=False))  # lineage cut — the
        # convergence anti-join below is the materializing action, so
        # each round runs ONE Spark job (the connected_components idiom)
        changed = nxt.join(paths, ["src", "dst", "dist"],
                           "left_anti").count()
        paths = nxt
        if changed == 0:
            return paths
    raise RuntimeError(
        f"{caller} did not converge in {max_iter} rounds")


def extend_closure(closure: DataFrame, new_edges: DataFrame,
                   src: str = "src", dst: str = "dst",
                   max_iter: int = 25) -> DataFrame:
    """Incrementally maintain a transitive closure under EDGE INSERTS —
    ``extend_closure(transitive_closure(G), E+)`` equals
    ``transitive_closure(G ∪ E+)`` (same exact min-hop distances)
    without re-deriving the old graph's paths from its edges.

    Why this exists: hierarchy predicates (is-a / part-of rollups)
    stream in alongside every other assertion, but rebuilding a
    10^9-pair closure because a micro-batch added 10^3 edges is the
    kind of O(full) maintenance cost the delta-then-compact stores
    (``streaming/deltastore.py``) were built to avoid. Insert-only
    closure is ALGEBRAIC in exactly their sense: the closure is a
    min-fold over path lengths, and new edges only ever ADD pairs or
    SHORTEN distances, so folding the delta into the old fixpoint is
    sound. Edge DELETION is NOT supported here — a min-fold cannot
    retract a path that no longer exists; delete-heavy hierarchies must
    rebuild via ``transitive_closure`` (the same append-only discipline
    ``streaming/history.py`` documents for SCD2 intervals).

    Cost model (the incremental win): seeded with the old closure C and
    delta edges E+, every path of G ∪ E+ decomposes into alternating
    C-segments and E+ edges — a concatenation of at most 2k+1 seed rows
    for a path using k delta edges. Path doubling composes all
    concatenations of ≤ 2^r seed rows after r rounds, so convergence is
    ⌈log2(delta edges on any shortest path)⌉ + 1 rounds — for a
    micro-batch-sized delta typically 2-3 rounds, independent of the
    depth of the existing hierarchy (a full rebuild pays
    ⌈log2(depth)⌉ + 1 from scratch). Each round stays the same two
    hash-partitioned equi-join + min-groupBy jobs as the full build; no
    driver state, no collect.

    ``closure`` must carry (src, dst, dist) as produced by
    ``transitive_closure``; ``new_edges`` carries the delta edge pairs
    (self-loops dropped, duplicates folded by the min).
    """
    delta = (new_edges.select(F.col(src).alias("src"),
                              F.col(dst).alias("dst"))
             .filter(F.col("src") != F.col("dst")).distinct()
             .withColumn("dist", F.lit(1).cast("long")))
    seed = (closure.select("src", "dst", F.col("dist").cast("long"))
            .unionByName(delta)
            .groupBy("src", "dst").agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True))
    return _minplus_doubling(seed, max_iter, "extend_closure")


def subgraph_export(edges: DataFrame, seeds: DataFrame, k: int = 2,
                    src: str = "src", dst: str = "dst",
                    seed_col: str = "node") -> DataFrame:
    """Induced k-hop subgraph pull — the RAG/entity-card read that
    completes ``khop_reach``: not just WHICH nodes are within k hops of
    the seeds, but the edge set AMONG them (both endpoints inside the
    neighborhood), with each endpoint's hop distance attached so a
    consumer can rank context by proximity.

    Composition: ``khop_reach`` labels the neighborhood, then the edge
    table is reduced with two co-keyed inner joins against that
    (small) node set — the joins ARE the induced-subgraph filter, and
    they carry the hop columns along for free. No collect, no
    broadcast assumption (Catalyst broadcasts the hop table itself
    when it is small enough; for billion-node neighborhoods the joins
    degrade gracefully to shuffles on the endpoint keys). Directed
    edges are returned as stored; symmetrization is ``khop_reach``'s
    internal concern only.
    """
    hops = khop_reach(edges, seeds, k=k, src=src, dst=dst,
                      seed_col=seed_col)
    h_src = hops.select(F.col("node").alias(src),
                        F.col("hops").alias("src_hops"))
    h_dst = hops.select(F.col("node").alias(dst),
                        F.col("hops").alias("dst_hops"))
    return (edges.select(src, dst).distinct()
            .join(h_src, src).join(h_dst, dst)
            .select(src, dst, "src_hops", "dst_hops"))


def dedup_survivors(pairs: DataFrame, docs: DataFrame,
                    id_col: str = "doc_id", src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Cluster-aware dedup keep-list: one survivor (minimum id) per
    near-dup component; docs not in any pair survive trivially. Returns
    ``docs`` filtered to survivors — the materializer counterpart of
    ``dedup.dedup_exact_keep_first`` for TRANSITIVE near-dup clusters."""
    comp = connected_components(pairs, src=src, dst=dst)
    losers = comp.filter(F.col("node") != F.col("comp")) \
        .select(F.col("node").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


def _oriented_triangles(canon: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Degree-oriented triangle enumeration over a ``(x, y)``
    canonicalized simple graph (``_canon_undirected`` output) — the
    shared core of ``triangle_count`` and ``ktruss``. Returns
    ``(deg, tri)``: the per-node degree table and one row per triangle
    as ``(u, v, w)`` in (degree, id)-rank order, each triangle exactly
    once. Every node's oriented out-degree is O(sqrt(|E|)) regardless
    of raw skew (Suri & Vassilvitskii's MR_NI), so the wedge join's
    fan-out is bounded even at hub nodes.
    """
    deg = (canon.select(F.col("x").alias("node"))
           .unionAll(canon.select(F.col("y").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg")))
    dx = deg.select(F.col("node").alias("x"), F.col("deg").alias("dx"))
    dy = deg.select(F.col("node").alias("y"), F.col("deg").alias("dy"))
    # orient x→y iff (deg, id) of x < (deg, id) of y
    fwd = (F.col("dx") < F.col("dy")) | \
        ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    oriented = (canon.join(dx, "x").join(dy, "y")
                .select(F.when(fwd, F.col("x")).otherwise(F.col("y"))
                        .alias("u"),
                        F.when(fwd, F.col("y")).otherwise(F.col("x"))
                        .alias("v"),
                        F.when(fwd, F.col("dx")).otherwise(F.col("dy"))
                        .alias("du"),
                        F.when(fwd, F.col("dy")).otherwise(F.col("dx"))
                        .alias("dv")))
    e1 = oriented.select("u", "v", "dv")
    e2 = oriented.select(F.col("u").alias("u2"), F.col("v").alias("w"),
                         F.col("dv").alias("dw"))
    wedges = (e1.join(e2, e1["u"] == e2["u2"])
              .filter((F.col("dv") < F.col("dw"))
                      | ((F.col("dv") == F.col("dw"))
                         & (F.col("v") < F.col("w"))))
              .select("u", "v", "w"))
    closing = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"])  # u < v < w in rank order
    return deg, tri


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact per-node triangle counts over an undirected graph — the
    clustering-coefficient numerator, and on a near-dup candidate graph
    a direct read on how clique-like (template/boilerplate families) vs
    chain-like (drifting revisions) the duplicate structure is.

    Algorithm: degree orientation + two equi-joins (the MapReduce
    triangle-enumeration standard, cf. Suri & Vassilvitskii's MR_NI /
    Cohen's MapReduce graph-twiddling): orient every edge from the
    (degree, id)-SMALLER endpoint to the larger, so each triangle is
    enumerated EXACTLY once as u→v, u→w, v→w with rank(u)<rank(v)<rank(w),
    and — the scale property that matters — every node's out-degree is
    O(sqrt(|E|)) regardless of raw degree skew: a celebrity node with
    10^6 neighbors is never the join fan-out side. Both joins are hash
    equi-joins on a node key; no node ranking is materialized globally
    (the (deg, id) tuple comparison happens edge-local).

    Input edges may carry duplicates, self-loops, or either direction;
    they are canonicalized first (one distinct). Returns
    ``(node, n_triangles)`` for every node of the graph (zero-triangle
    nodes included via a left join against the node set).
    """
    canon = _canon_undirected(edges, src, dst)
    deg, tri = _oriented_triangles(canon)
    per_node = (tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
                .groupBy("node")
                .agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
    return (deg.select("node").join(per_node, "node", "left")
            .select("node", F.coalesce(F.col("n_triangles"), F.lit(0))
                    .cast("long").alias("n_triangles")))


def kcore(pairs: DataFrame, k: int, src: str = "src", dst: str = "dst",
          max_iter: int = 100) -> DataFrame:
    """The k-core of an undirected graph — the maximal subgraph where
    every node keeps degree ≥ k — by synchronous iterative peeling:
    each round simultaneously deletes EVERY node currently below k and
    re-derives degrees, until a fixpoint. The trust/quality audit a KG
    release runs next to ``degree_distribution``: 2-core strips pendant
    extraction debris (one-shot assertions hanging off the graph),
    higher cores isolate the densely-corroborated backbone; on a
    near-dup candidate graph the k-core is the template/boilerplate
    family detector (cliques survive, drifting chains dissolve).

    Returns ``(node, deg)`` for surviving nodes — ``deg`` is the
    node's degree INSIDE the core (≥ k by construction). Empty result
    when no k-core exists. Deterministic: peeling has a unique
    fixpoint (the k-core is well-defined), so partitioning/order never
    matter. Edges may carry duplicates/self-loops/either direction —
    canonicalized once up front.

    Round bound is the graph's PEELING DEPTH (how many synchronous
    sub-k strips it takes — bounded by the degeneracy ordering's layer
    count), not O(log n): a worst-case k=2 path peels two endpoints
    per round. Real KG/near-dup graphs peel shallow (hubs hold cores
    together); ``max_iter`` raises rather than silently truncating,
    the ``connected_components`` discipline. Core NUMBERS (per-node
    max k) are documented out of scope: they need either |degeneracy|
    sequential peels or an h-index fixpoint — cost without a consumer.

    100 TB shape: per round ONE partial-aggregating degree groupBy +
    two LEFT SEMI equi-joins filtering the edge list; the edge table
    stays distributed, the convergence check is a scalar count, and
    each round ends with an eager localCheckpoint (edges feed both
    semi-joins AND next round's degrees — without the cut the plan
    doubles per round, the module-docstring discipline).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    canon = (_canon_undirected(pairs, src, dst)
             .localCheckpoint(eager=True))
    n_edges = canon.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = (canon.select(F.col("x").alias("node"))
               .unionAll(canon.select(F.col("y").alias("node")))
               .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
        keep = deg.filter(F.col("deg") >= k).select("node")
        nxt = (canon
               .join(keep.withColumnRenamed("node", "x"), "x", "left_semi")
               .join(keep.withColumnRenamed("node", "y"), "y", "left_semi")
               .localCheckpoint(eager=True))
        n_nxt = nxt.count()
        if n_nxt == n_edges:
            break
        canon, n_edges = nxt, n_nxt
    else:
        raise RuntimeError(f"kcore(k={k}) did not converge in "
                           f"{max_iter} rounds")
    return (canon.select(F.col("x").alias("node"))
            .unionAll(canon.select(F.col("y").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).cast("long")
                                 .alias("deg")))


def ktruss(pairs: DataFrame, k: int, src: str = "src", dst: str = "dst",
           max_iter: int = 100) -> DataFrame:
    """The k-truss of an undirected graph — the maximal subgraph where
    every EDGE participates in ≥ k−2 triangles (within the subgraph) —
    by synchronous support peeling. The edge-grain sharpening of
    ``kcore``: a k-core keeps nodes with enough neighbors, a k-truss
    keeps edges with enough MUTUALLY-CONNECTED neighbors, so it
    isolates genuinely clique-like structure (template/boilerplate
    families on a near-dup graph, mutually-corroborating assertion
    clusters on the KG) that a degree bound alone can't separate from
    star hubs: a pure hub's edges close no triangles and dissolve at
    k=3 no matter the degree.

    Returns surviving canonical edges ``(x, y, support)`` with
    ``x < y``; ``support`` is the edge's triangle count INSIDE the
    truss (≥ k−2 by construction). Empty result when no k-truss
    exists. Deterministic: the k-truss is a unique fixpoint, so
    partitioning/order never matter. ``k ≥ 3`` required (the 2-truss
    is the whole simple graph — meaningless as an audit). Edges may
    carry duplicates/self-loops/either direction — canonicalized once.

    Round bound is the truss PEELING DEPTH (a fan of triangles
    cascades one layer per round — the ``kcore`` honesty rule, not
    O(log n)); ``max_iter`` raises rather than silently truncating.

    100 TB shape: per round ONE degree-oriented triangle enumeration
    (two equi-joins, per-node fan-out O(√|E|) under any hub skew — the
    ``triangle_count`` core, shared via ``_oriented_triangles``), one
    map-only explode of 3 edge-slots per triangle, one
    partial-aggregating support groupBy, one co-keyed join back to the
    edge list; each round ends with an eager localCheckpoint (the
    module's iterative-loop discipline) and the convergence check is a
    scalar count.
    """
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    canon = (_canon_undirected(pairs, src, dst)
             .localCheckpoint(eager=True))
    n_edges = canon.count()
    thresh = k - 2
    for _ in range(max_iter):
        if n_edges == 0:
            return canon.select("x", "y",
                                F.lit(0).cast("long").alias("support"))
        _, tri = _oriented_triangles(canon)
        # each triangle supports its 3 edges; emit them in canonical
        # (least, greatest) id order — rank order (u,v,w) need not be
        # lexicographic
        slots = F.array(*[
            F.struct(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
            for a, b in (("u", "v"), ("u", "w"), ("v", "w"))])
        sup = (tri.select(F.explode(slots).alias("e"))
               .groupBy(F.col("e.x").alias("x"), F.col("e.y").alias("y"))
               .agg(F.count(F.lit(1)).cast("long").alias("support")))
        # edges in no triangle have no support row -> support 0 -> drop
        keep = (canon.join(sup, ["x", "y"], "left")
                .filter(F.coalesce("support", F.lit(0)) >= thresh)
                .localCheckpoint(eager=True))
        n_keep = keep.count()
        if n_keep == n_edges:
            # fixpoint: the supports just computed ARE in-truss supports
            return keep.select("x", "y", "support")
        canon, n_edges = keep.select("x", "y"), n_keep
    raise RuntimeError(f"ktruss(k={k}) did not converge in "
                       f"{max_iter} rounds")


def truss_communities(pairs: DataFrame, k: int = 3, src: str = "src",
                      dst: str = "dst") -> DataFrame:
    """Cohesive communities as the connected components of the k-truss
    — the standard truss-community definition (Huang et al., "Querying
    k-truss community in large and dynamic graphs"): first keep only
    edges corroborated by ≥ k−2 triangles, then label what hangs
    together. Unlike raw ``connected_components`` (which one noisy
    bridge edge fuses into a giant blob) a truss community only admits
    an edge its neighborhood actually vouches for, so extraction noise
    and hub stitching don't merge unrelated entity clusters — the
    community read-out a KG review queue and a template-family dedup
    report both want.

    Returns ``(node, comp)`` for every node of the k-truss, ``comp``
    the min-label of its community (the ``connected_components``
    contract). Nodes outside the truss carry no row. Deterministic:
    both stages are unique fixpoints.

    100 TB shape: exactly ``ktruss`` + ``connected_components`` —
    nothing new; the component loop runs on the already-thinned truss
    edge set.
    """
    return connected_components(ktruss(pairs, k, src=src, dst=dst),
                                src="x", dst="y")


def link_scores(pairs: DataFrame, src: str = "src", dst: str = "dst",
                hub_cap: int = 256, round_to: int = 6) -> DataFrame:
    """Topological link-prediction scoring — for every NON-edge pair at
    distance 2 in the undirected graph, the three classic neighborhood
    scores (Liben-Nowell & Kleinberg's link-prediction baselines):

    * ``cn``          — common-neighbor count
    * ``adamic_adar`` — Σ over common neighbors z of 1 / ln(deg(z))
    * ``jaccard``     — cn / (deg(a) + deg(b) − cn)

    This is the native candidate GENERATOR + SCORER that closes the
    repo's link-prediction lifecycle: ``kg_graph.negative_samples``
    makes training corruptions, ``plans/evaluate.ranking_metrics``
    evaluates any scored candidate table — this produces one without an
    external model (and is the standard baseline an embedding model
    must beat). Output grain: one row per unordered candidate pair
    ``(a, b)`` with ``a < b``, existing edges anti-joined away; pairs
    at distance > 2 (all three scores zero by definition) are never
    materialized.

    Determinism: cn is an exact count; the Adamic–Adar fold quantizes
    each 1/ln(deg(z)) weight to a 1e-9-grain LONG before summing (the
    ``walks.embed_nodes`` discipline), so the aggregate is exact
    integer arithmetic — bit-identical on any partitioning/retry —
    then rescaled and rounded to ``round_to``. Degree-1 centers are
    pruned before the weight is computed (they have no neighbor pair
    to witness), so ln(deg) is always > 0.

    100 TB shape: degrees = one partial-aggregating groupBy; wedge
    enumeration = ONE self-equi-join of the directed adjacency on the
    center node + one partial-aggregating (a, b) groupBy; then one
    LEFT ANTI against the edge set and two co-keyed degree joins for
    the jaccard denominator. The scale hazard is the hub center (a
    "USA" entity adjacent to everything contributes deg² wedge rows):
    ``hub_cap`` applies the df-cap discipline from
    ``kg_graph.compose_relations`` — nodes whose degree exceeds the cap
    are dropped from the CENTER role before the self-join (documented
    recall/score bound, not silent truncation; a hub's per-wedge
    Adamic–Adar weight 1/ln(deg) is the least informative anyway —
    that is the very intuition the measure encodes). True degrees (not
    capped ones) feed the weights and denominators.
    """
    canon = _canon_undirected(pairs, src, dst)
    adj = (canon.select(F.col("x").alias("z"), F.col("y").alias("n"))
           .unionAll(canon.select(F.col("y").alias("z"),
                                  F.col("x").alias("n"))))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # center stream: ride the TRUE degree along, cap the center role;
    # deg >= 2 prunes pair-less centers AND keeps ln(deg) > 0 under ANSI
    ctr = (adj.join(deg.filter((F.col("deg") >= 2)
                               & (F.col("deg") <= hub_cap)), "z")
           .withColumn("w_q", F.round(F.lit(1e9)
                                      / F.log(F.col("deg").cast("double")))
           .cast("long")))
    left = ctr.select("z", F.col("n").alias("a"), "w_q")
    right = ctr.select("z", F.col("n").alias("b"))
    scored = (left.join(right, "z")
              .filter(F.col("a") < F.col("b"))
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).cast("long").alias("cn"),
                   F.sum("w_q").alias("aa_q")))
    nonedge = scored.join(
        canon.select(F.col("x").alias("a"), F.col("y").alias("b")),
        ["a", "b"], "left_anti")
    da = deg.select(F.col("z").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("z").alias("b"), F.col("deg").alias("_db"))
    return (nonedge.join(da, "a").join(db, "b")
            .select("a", "b", "cn",
                    F.round(F.col("aa_q") / 1e9, round_to)
                    .alias("adamic_adar"),
                    F.round(F.col("cn") / (F.col("_da") + F.col("_db")
                                           - F.col("cn")), round_to)
                    .alias("jaccard")))


def clustering_coefficient(edges: DataFrame, src: str = "src",
                           dst: str = "dst",
                           round_to: int = 6) -> DataFrame:
    """Local clustering coefficient per node — ``2·T / (deg·(deg−1))``
    where T is the node's triangle count: the standard companion
    read-out to ``triangle_count`` / ``kcore`` in a graph-quality
    audit. High coefficient = the node's neighborhood corroborates
    itself (entity cliques, template families); ~0 at high degree =
    a pure hub stitching otherwise-unrelated assertions (the
    extraction-error magnet worth sampling for review).

    Returns ``(node, deg, n_triangles, coeff)`` for every node of the
    canonicalized simple graph; degree-0/1 nodes get coeff 0.0 (no
    possible wedge — defined, not NULL, so downstream histograms need
    no special case). Deterministic: exact integer counts, one final
    rounded division.

    100 TB shape: exactly ``triangle_count``'s cost (its degree-
    oriented enumeration bounds join fan-out at O(sqrt(|E|)) per node
    regardless of hub skew) plus one co-keyed degree join — no new
    shuffle hazards.
    """
    canon = _canon_undirected(edges, src, dst)
    deg = (canon.select(F.col("x").alias("node"))
           .unionAll(canon.select(F.col("y").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).cast("long")
                                .alias("deg")))
    tri = triangle_count(canon, src="x", dst="y")
    d, t = F.col("deg"), F.col("n_triangles")
    coeff = F.when(d >= 2, F.round(2.0 * t / (d * (d - 1)), round_to)) \
        .otherwise(F.lit(0.0))
    return (deg.join(tri, "node")
            .select("node", "deg", "n_triangles", coeff.alias("coeff")))
