"""Keyword search over the document corpus — tf-idf scored OR-queries
(SURVEY.md §2, LLM-data-pipeline block: the retrieval primitive behind
corpus exploration and eval-set mining).

``keyword_search`` ranks documents matching ANY query term by summed
tf·idf. The scale shape is an inverted-index probe WITHOUT building the
index: the term filter is an ``isin`` over a literal list, so Catalyst
pushes it into the token stream before any shuffle — the corpus is
scanned once, and only rows for the handful of query terms survive into
the (doc, term) aggregate. df/idf for the query terms come from the
same filtered stream (a second tiny aggregate over it, broadcast back).
For a standing search workload you would materialize the inverted index
once (token → posting list, bucketed by token); this operator is the
ad-hoc form that needs no precomputation.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyword_search(docs: DataFrame, terms: list[str],
                   top_k: int = 20) -> DataFrame:
    """Top-``top_k`` docs by summed tf·ln((D+1)/(df+1)) over the query
    ``terms`` (OR semantics). Deterministic: score rounded 4 dp, ties
    by doc_id. Returns (doc_id, n_terms_matched, score)."""
    toks = (docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
        .filter(F.col("w").isin(terms)))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    d_total = docs.select(F.count(F.lit(1)).alias("D"))
    scored = (tf.join(F.broadcast(dfreq), "w")
              .crossJoin(F.broadcast(d_total))
              .withColumn("tfidf", F.col("tf") * F.log(
                  (F.col("D") + 1) / (F.col("df") + 1))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
                 F.round(F.sum("tfidf"), 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k))
