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
    from morra_spark.operators.curation import smoothed_tfidf

    scored = (tf.join(F.broadcast(dfreq), "w")
              .crossJoin(F.broadcast(d_total))
              .withColumn("tfidf", smoothed_tfidf(
                  F.col("tf"), F.col("df"), F.col("D"))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
                 F.round(F.sum("tfidf"), 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k))


def pmi_collocations(docs: DataFrame, min_count: int = 5,
                     top_k: int = 20) -> DataFrame:
    """Collocation mining: top adjacent word pairs by NPMI (normalized
    pointwise mutual information, -1..1; 1 = the words only ever occur
    together). The phrase detector behind tokenizer phrase-merging and
    query suggestion.

    Plan: one explode for unigram counts, one for bigram counts (both
    partial-aggregating — a hot pair combines map-side), then the
    bigram table joins the unigram table TWICE on each word (co-keyed
    equi joins; the unigram side is vocabulary-sized, not corpus-
    sized). ``min_count`` prunes the long tail BEFORE the joins, which
    is what keeps the join input bounded at web scale. Deterministic:
    npmi rounded 4 dp desc, pair asc.
    """
    words = docs.select(
        F.split(F.trim(F.col("text")), r"\s+").alias("ws"))
    uni = (words.select(F.explode("ws").alias("w"))
           .filter(F.col("w") != "")
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    idxs = F.when(F.size("ws") >= 2,
                  F.sequence(F.lit(0), F.size("ws") - 2)) \
        .otherwise(F.array().cast("array<int>"))
    all_pairs = (words.select(F.explode(F.transform(
        idxs, lambda i: F.struct(
            F.element_at(F.col("ws"), i + 1).alias("wa"),
            F.element_at(F.col("ws"), i + 2).alias("wb")))).alias("p"))
        .select(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
        .groupBy("wa", "wb").agg(F.count(F.lit(1)).alias("cab")))
    n_uni = uni.agg(F.sum("cw").alias("nw"))
    # P(ab) denominator = ALL bigram slots, counted before the tail
    # prune (filtering first would inflate every surviving pair's
    # probability)
    n_bi = all_pairs.agg(F.sum("cab").alias("nb"))
    pairs = all_pairs.filter(F.col("cab") >= min_count)
    ua = uni.select(F.col("w").alias("wa"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("wb"), F.col("cw").alias("cb"))
    j = (pairs.join(ua, "wa").join(ub, "wb")
         .crossJoin(F.broadcast(n_uni)).crossJoin(F.broadcast(n_bi)))
    p_ab = F.col("cab") / F.col("nb")
    p_a = F.col("ca") / F.col("nw")
    p_b = F.col("cb") / F.col("nw")
    # p_ab == 1 (every bigram slot is this pair — single-pair boiler-
    # plate corpus) makes the -log(p_ab) divisor 0; NPMI is defined as
    # 1.0 there, same pin as kg_graph.comention_edges (code-review r5)
    npmi = F.when(p_ab >= 1.0, F.lit(1.0)) \
        .otherwise(F.log(p_ab / (p_a * p_b)) / -F.log(p_ab))
    return (j.select(
        F.concat_ws(" ", F.col("wa"), F.col("wb")).alias("pair"),
        F.col("cab").cast("long").alias("n"),
        F.round(npmi, 4).alias("npmi"))
        .orderBy(F.desc("npmi"), F.asc("pair")).limit(top_k))
