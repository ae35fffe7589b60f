"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the oracle-checked baseline
(``__spark_entry__.q_ann_cosine_topk``); the scale path here is
random-hyperplane LSH bucketing: 100 TB of vectors shrink to
per-bucket candidate sets, and the expensive exact cosine only runs
within buckets. Hyperplanes are a deterministic seed-derived literal
matrix baked into the plan (tiny), so the whole operator is built-in
higher-order functions — JVM-side, no Python workers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def _bucket_expr(planes, vec_col: str) -> F.Column:
    """Sign-pattern bucket id (0..2^n_planes-1) of dot products with
    the given hyperplanes — THE single definition of hyperplane
    bucketing, shared by ``lsh_bucket_ids`` and the OR-construction
    tables of ``embedding_near_dup`` (code-review r5: the expression
    used to exist twice, so a bucketing fix applied to one copy would
    silently diverge the two paths)."""
    bucket = F.lit(0).cast("long")
    for p in range(len(planes)):
        lit_plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_ids(emb: DataFrame, n_planes: int = 8, dim: int = 64,
                   vec_col: str = "embedding") -> DataFrame:
    """Add ``bucket`` = sign-pattern of dot products with n random
    hyperplanes (0..2^n_planes-1)."""
    return emb.withColumn(
        "bucket", _bucket_expr(_hyperplanes(n_planes, dim), vec_col))


def _probe_dim(emb: DataFrame, vec_col: str) -> int:
    """One-row probe for the vector width (array length is not in the
    schema). Callers that know the width should pass ``dim`` explicitly
    and skip this driver-side job entirely."""
    return emb.select(F.size(vec_col)).limit(1).collect()[0][0]


def lsh_bucket_stats(emb: DataFrame, n_planes: int = 8,
                     dim: int | None = None) -> DataFrame:
    """Bucket occupancy + label purity — the planning view that sizes the
    within-bucket exact-rescore stage."""
    dim = dim or _probe_dim(emb, "embedding")
    b = lsh_bucket_ids(emb, n_planes=n_planes, dim=dim)
    return (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.countDistinct("label").alias("n_labels"))
            .orderBy("bucket"))


def _cosine(ea: str, eb: str):
    dot = F.aggregate(F.zip_with(ea, eb,
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    return dot / (norm(ea) * norm(eb))


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95,
                       n_planes: int = 8, n_tables: int = 8,
                       dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: multi-table hyperplane LSH
    (OR-construction) prunes the candidate space, exact double-precision
    cosine verifies. Returns (va, vb, cosine) with cosine ≥ threshold.

    Recall: a pair at cosine s collides in one table with prob.
    p = (1 − arccos(s)/π)^n_planes, and is a candidate with prob.
    1 − (1 − p)^n_tables. Defaults (8 planes × 8 tables): ≈ 0.99 at
    s = 0.95, miss ≈ 2e-8 at s = 0.999; identical vectors always
    collide. A single table (round-1 shape) missed any pair straddling
    one of its planes — ~11% of 0.999-cosine pairs.

    Execution shape for 100 TB: all n_tables bucket ids are computed in
    ONE map pass (posexplode of a bucket array — the plane matrices are
    plan literals), so there is exactly one self-join keyed on
    (table_id, bucket), hash-distributed and skew-free; candidates are
    deduped as (va, vb) id pairs BEFORE the vectors are fetched back for
    the exact rescore, so the wide embedding arrays never flow through
    the candidate union."""
    dim = dim or _probe_dim(emb, "embedding")
    vecs = emb.select("vec_id", "embedding")

    def bucket_expr(table: int):
        # per-table seed, same shared bucketing expression as
        # lsh_bucket_ids (_bucket_expr — one definition, two callers)
        return _bucket_expr(
            _hyperplanes(n_planes, dim, seed=7 + 101 * table),
            "embedding")

    banded = vecs.select(
        "vec_id",
        F.posexplode(F.array(*[bucket_expr(t) for t in range(n_tables)]))
         .alias("table_id", "bucket"))
    a_side, b_side = banded.alias("a"), banded.alias("b")
    cand = (a_side.join(b_side,
                        (F.col("a.table_id") == F.col("b.table_id"))
                        & (F.col("a.bucket") == F.col("b.bucket"))
                        & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("va"),
                    F.col("b.vec_id").alias("vb"))
            .distinct())
    ea = vecs.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    eb = vecs.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    return (cand.join(ea, "va").join(eb, "vb")
            .withColumn("cosine", _cosine("ea", "eb"))
            .filter(F.col("cosine") >= threshold)
            .select("va", "vb", F.round("cosine", 4).alias("cosine"))
            .orderBy("va", "vb"))


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-bucketed scale path
# ---------------------------------------------------------------------

def train_ivf_centroids(emb: DataFrame, n_centroids: int = 16,
                        dim: int | None = None, sample: int = 4096,
                        iters: int = 10, seed: int = 7,
                        vec_col: str = "embedding") -> np.ndarray:
    """Coarse quantizer: spherical mini k-means on a BOUNDED sample.

    Sample-based training is the standard IVF recipe (FAISS-style): the
    sample size is fixed, not proportional to the table, so driver cost
    stays O(sample × dim × iters) at any corpus scale. The sample is
    deterministic (crc32-of-id filter, id-ordered tiebreak), centroids
    are unit-normalized (cosine ≡ dot after normalization), and empty
    clusters are reseeded from the farthest points — so a fixed seed
    reproduces the index bit-for-bit.
    """
    dim = dim or _probe_dim(emb, vec_col)
    # deterministic pseudo-random sample: rank ids by (crc32 bucket,
    # vec_id) and TakeOrdered the first `sample` — Spark plans
    # TakeOrderedAndProject (per-partition top-k, driver merges only
    # k rows per partition; no full shuffle/sort), and a fixed seedless
    # hash order makes the sample reproducible at any partitioning
    pool = (emb.select("vec_id", vec_col)
            .withColumn("h", F.crc32(F.col("vec_id").cast("string")) % 1000)
            .orderBy("h", "vec_id").limit(sample))
    X = np.array([r[vec_col] for r in pool.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("empty embedding table")
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    k = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        sims = X @ C.T                       # (n, k), cosine == dot
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                v = members.sum(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
            else:  # reseed from the globally worst-served point
                C[c] = X[sims.max(axis=1).argmin()]
    return C


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding") -> DataFrame:
    """Add ``cid`` = nearest-centroid id. One vectorized Arrow batch
    matmul per task (pandas UDF, centroids closed over as a small dense
    matrix — broadcast-by-closure, ~k×dim floats); map-only, no shuffle.
    At ingest time the assigned table is written partitioned/bucketed by
    ``cid`` so probes become partition-pruned scans."""
    from pyspark.sql.functions import pandas_udf

    C = centroids.astype(np.float64)

    @pandas_udf("int")
    def nearest(v):  # pd.Series of lists
        import pandas as pd

        X = np.asarray(v.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series((X @ C.T).argmax(axis=1))

    return emb.withColumn("cid", nearest(F.col(vec_col)))


def ann_ivf_topk(emb: DataFrame, queries: DataFrame, centroids: np.ndarray,
                 k: int = 10, nprobe: int = 2,
                 vec_col: str = "embedding") -> DataFrame:
    """IVF search: each query probes its ``nprobe`` nearest centroid
    buckets; exact cosine runs only inside those buckets; window top-k
    per query. Returns (qid, vec_id, cosine) with rank ≤ k.

    100 TB shape: the (qid, cid) probe table is tiny → **broadcast**
    against the cid-assigned corpus, so the big side never shuffles for
    candidate selection; the only exchange is the per-query top-k over
    candidates (~nprobe/n_centroids of the corpus per query). Recall is
    tunable by nprobe with zero index rebuild.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    C = centroids.astype(np.float64)
    np_ = int(min(nprobe, len(C)))

    @pandas_udf("array<int>")
    def probe_cids(v):
        import pandas as pd

        X = np.asarray(v.tolist(), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(X @ C.T), axis=1)[:, :np_]
        return pd.Series(list(order.astype(np.int32)))

    probes = (queries.select("qid", F.col("q").alias("qv"))
              .withColumn("cid", F.explode(probe_cids(F.col("qv")))))
    assigned = emb if "cid" in emb.columns else ivf_assign(emb, C, vec_col)
    cand = assigned.join(F.broadcast(probes), "cid")
    scored = cand.withColumn("cosine", _cosine(vec_col, "qv"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("qid", "vec_id", F.round("cosine", 4).alias("cosine"),
                    "rank"))


def cosine_topk(emb: DataFrame, query: DataFrame, k: int = 20,
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of ``emb`` against a 1-row ``query(q)`` frame —
    the within-bucket rescorer (broadcast the query side)."""
    j = emb.crossJoin(F.broadcast(query))
    dot = F.aggregate(F.zip_with(vec_col, "q",
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    return (j.select("vec_id", "label",
                     (dot / (norm(vec_col) * norm("q"))).alias("cosine"))
            .orderBy(F.desc("cosine"), "vec_id").limit(k))


def embedding_centroids(vecs: DataFrame, group_col: str = "label",
                        vec_col: str = "embedding") -> DataFrame:
    """Per-group embedding centroid in LONG form — (group, dim, centroid
    component, per-dim variance, group size). The aggregate behind
    semantic drift monitoring (compare a source's centroid between
    snapshots) and per-domain mean-pooled representations.

    Long form is deliberate twice over: (1) posexplode + a (group, dim)
    partial-aggregating groupBy streams — no per-group collect_list of
    whole vectors, so a group with 10^9 members costs its row count,
    never its memory; (2) scalar double columns are what the DuckDB
    oracle can value-compare exactly (an array<double> column would be
    string-compared post-round with engine-specific float formatting).
    Variance uses the population form E[x^2] - E[x]^2 in BOTH engines,
    computed against the ROUNDED mean so the subtraction replays
    bit-for-bit.
    """
    g = F.col(group_col)
    ex = vecs.select(g.alias("grp"),
                     F.posexplode(F.col(vec_col)).alias("dim", "x")) \
        .withColumn("x", F.col("x").cast("double"))
    agg = (ex.groupBy("grp", "dim")
           .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                F.round(F.avg("x"), 6).alias("centroid"),
                F.round(F.avg(F.col("x") * F.col("x")), 6).alias("ex2")))
    return (agg.withColumn("variance",
                           F.round(F.col("ex2")
                                   - F.col("centroid") * F.col("centroid"), 6))
            .select("grp", "dim", "n_vecs", "centroid", "variance"))


def embedding_drift(old: DataFrame, new: DataFrame, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_to: int = 6) -> DataFrame:
    """Build-over-build embedding CDC — the vector twin of
    ``kg_graph.edge_diff``: label every id ``added`` / ``removed`` /
    ``kept`` between two embedding builds and, for kept ids, the cosine
    between the two versions. The release gate a pipeline re-deriving
    embeddings (new walk corpus, retrained projection, upstream KG
    change) runs before swapping the serving table: "how many vectors
    moved, and how far" — a mass low-cosine band means every downstream
    ANN index and cached neighborhood is stale.

    Output: ``(vec_id, status, cosine)`` — cosine NULL for added /
    removed rows and for kept rows where either side is a zero vector
    (no direction to compare — flagged, not silently 0). Rounded to
    ``round_to`` so downstream folds see engine-stable values.

    100 TB shape: ONE co-keyed full-outer equi-join on the id; the
    cosine is a JVM fold over the two array columns riding the join row
    (no explode — a drift scan is one pass, unlike ``embedding_centroids``
    whose long form exists for groupBy mergeability); the wide arrays
    are dropped before any downstream shuffle. Histogram/thresholding
    is the caller's one extra aggregate over (status, cosine).
    """
    o = old.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("_ea"))
    n = new.select(F.col(id_col).alias("vec_id"),
                   F.col(vec_col).alias("_eb"))
    j = o.join(n, "vec_id", "full_outer")
    status = (F.when(F.col("_ea").isNull(), "added")
              .when(F.col("_eb").isNull(), "removed")
              .otherwise("kept"))
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    cos = F.round(_cosine("_ea", "_eb"), round_to)
    safe = F.when((F.col("_ea").isNotNull() & F.col("_eb").isNotNull()
                   & (sq("_ea") > 0) & (sq("_eb") > 0)), cos)
    return j.select("vec_id", status.alias("status"),
                    safe.alias("cosine"))
