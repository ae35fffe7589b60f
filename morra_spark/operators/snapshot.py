"""Corpus snapshot diff — CDC accounting between two versions of a
document corpus (SURVEY.md §2, LLM-data-pipeline block).

A recurring crawl/refresh produces corpus v(N+1) next to v(N); before
retraining anyone sane asks "what actually changed?". ``snapshot_diff``
labels every key as added / removed / changed / unchanged by a single
co-keyed full outer join comparing content fingerprints — the batch
form of change-data-capture.

Scale shape (100 TB): ONE full-outer sort-merge join keyed by the doc
key; both sides are fingerprinted map-side first (md5 over text), so
the shuffled rows carry a 32-byte digest, not document bodies. If both
snapshots are written bucketed by the key (``plans/bucketing.py``) the
exchange disappears entirely. On Iceberg the same report falls out of
snapshot metadata (``sources/tableio.py`` seam) without reading data
files — this operator is the format-agnostic fallback that only needs
two parquet dirs.

The fingerprint is the engine-portable md5 (same family as
``dedup._portable_hash60``), so the DuckDB oracle replays the exact
added/removed/changed labeling bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evolve_corpus(docs: DataFrame) -> DataFrame:
    """Deterministically derive snapshot v2 from v1 (test scaffolding,
    loudly synthetic — the corpus is the sandbox's synthetic parquet,
    so known churn is planted from doc_id and the oracle replays it):

    - doc_id % 7 == 0  → dropped (removed docs);
    - doc_id % 5 == 0 (and not dropped) → text gets a suffix (changed);
    - a shifted copy of doc_id % 11 == 0 arrives as doc_id + 100000
      (added docs);
    - everything else carries over byte-identical (unchanged).
    """
    did = F.col("doc_id")
    kept = docs.filter(did % 7 != 0)
    mutated = kept.withColumn(
        "text",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text")))
    arrivals = (docs.filter(did % 11 == 0)
                .withColumn("doc_id", did + 100_000))
    return mutated.unionByName(arrivals)


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key: str = "doc_id",
                  content: str = "text") -> DataFrame:
    """Per-key CDC labeling between two corpus snapshots:

    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both, fingerprint differs), ``unchanged`` (both,
    identical). Returns ``(key, status, old_fp, new_fp)`` — fingerprints
    are md5 digests computed map-side BEFORE the join, so the full-outer
    exchange never carries document bodies.
    """
    # null content fingerprints as '' (not NULL) — a NULL fp would make
    # the status CASE read an existing row as 'added'/'removed'
    fp = lambda side: F.md5(F.coalesce(F.col(content), F.lit("")) # noqa: E731
                            ).alias(f"{side}_fp")
    o = old.select(F.col(key), fp("old"))
    n = new.select(F.col(key), fp("new"))
    status = (F.when(F.col("old_fp").isNull(), F.lit("added"))
              .when(F.col("new_fp").isNull(), F.lit("removed"))
              .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return (o.join(n, key, "full_outer")
            .select(key, status.alias("status"), "old_fp", "new_fp"))
