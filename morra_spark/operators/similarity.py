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


def lsh_bucket_ids(emb: DataFrame, n_planes: int = 8, dim: int = 64,
                   vec_col: str = "embedding") -> DataFrame:
    """Add ``bucket`` = sign-pattern of dot products with n random
    hyperplanes (0..2^n_planes-1)."""
    planes = _hyperplanes(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in planes[p]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.withColumn("bucket", bucket)


def lsh_bucket_stats(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """Bucket occupancy + label purity — the planning view that sizes the
    within-bucket exact-rescore stage."""
    dim = len(emb.select("embedding").first()[0])
    b = lsh_bucket_ids(emb, n_planes=n_planes, dim=dim)
    return (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.countDistinct("label").alias("n_labels"))
            .orderBy("bucket"))


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95,
                       n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH hyperplane buckets
    prune the candidate space (identical/near vectors share a bucket
    with high probability), exact double-precision cosine verifies
    within buckets. Returns (va, vb, cosine) with cosine ≥ threshold.

    At 100 TB scale the bucket join is the only shuffle and its key is
    hash-distributed; the quadratic exact check runs per bucket, bounded
    by bucket occupancy (monitored via ``lsh_bucket_stats``)."""
    dim = len(emb.select("embedding").first()[0])
    b = lsh_bucket_ids(emb, n_planes=n_planes, dim=dim) \
        .select("vec_id", "embedding", "bucket")
    a_side = b.alias("a")
    b_side = b.alias("b")
    pairs = (a_side.join(b_side, (F.col("a.bucket") == F.col("b.bucket"))
                         & (F.col("a.vec_id") < F.col("b.vec_id")))
             .select(F.col("a.vec_id").alias("va"),
                     F.col("b.vec_id").alias("vb"),
                     F.col("a.embedding").alias("ea"),
                     F.col("b.embedding").alias("eb")))
    dot = F.aggregate(F.zip_with("ea", "eb",
                                 lambda x, y: x.cast("double") * y.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    return (pairs.withColumn("cosine", dot / (norm("ea") * norm("eb")))
            .filter(F.col("cosine") >= threshold)
            .select("va", "vb", F.round("cosine", 4).alias("cosine"))
            .orderBy("va", "vb"))


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
