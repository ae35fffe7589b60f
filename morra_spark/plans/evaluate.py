"""Triple P/R evaluation vs gold (SURVEY.md §2 A13 + B-SO2).

Set-operation formulation on the exact canonical triple
(conv_id, turn_idx, subj, pred, obj): TP = pred ∩ gold,
FP = pred − gold, FN = gold − pred — computed with multiset-safe
anti-joins, the scale-correct equivalent of morra's per-field accuracy
evaluators ([PK] morra/morph_parser*.py::evaluate_*)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["conv_id", "turn_idx", "subj", "pred", "obj"]


def triple_pr(pred: DataFrame, gold: DataFrame) -> dict:
    p = pred.select(*KEY).groupBy(*KEY).agg(F.count(F.lit(1)).alias("np"))
    g = gold.select(*KEY).groupBy(*KEY).agg(F.count(F.lit(1)).alias("ng"))
    j = p.join(g, KEY, "full")
    agg = j.agg(
        F.sum(F.least(F.coalesce("np", F.lit(0)), F.coalesce("ng", F.lit(0)))).alias("tp"),
        F.sum(F.coalesce("np", F.lit(0))).alias("n_pred"),
        F.sum(F.coalesce("ng", F.lit(0))).alias("n_gold"),
    ).collect()[0]
    tp, n_pred, n_gold = agg["tp"] or 0, agg["n_pred"] or 0, agg["n_gold"] or 0
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "n_pred": n_pred, "n_gold": n_gold,
            "precision": precision, "recall": recall, "f1": f1}


def ranking_metrics(scored: DataFrame, *,
                    query_cols: tuple[str, ...] = ("subj", "pred"),
                    cand_col: str = "obj", score_col: str = "score",
                    label_col: str = "is_pos",
                    ks: tuple[int, ...] = (1, 3, 10),
                    filtered: bool = False) -> DataFrame:
    """Link-prediction ranking evaluation — MRR and Hits@k over a
    scored candidate table, the standard read-out for any KG-embedding
    model trained on this repo's exports (``walks.random_walks``
    corpus, ``kg_graph.negative_samples`` negatives).

    Input grain: one row per (query, candidate) with a model score and
    a positive/negative label — i.e. the scored union of true triples
    and their corruptions, already "filtered" by the caller (negatives
    colliding with real positives removed, which ``negative_samples``
    guarantees by construction). Each positive's rank is its 1-based
    position among ALL of its query's candidates ordered by
    (score desc, candidate asc) — the tie-break is deterministic by
    candidate id rather than random-permutation-averaged, so the metric
    is bit-reproducible across runs/engines (the repo-wide determinism
    rule; a model scoring ties hurts itself under this protocol, which
    is the conservative direction). With ``filtered=True`` a query's
    other positives are excluded when ranking each positive — the
    standard "filtered" KG-eval setting for multi-positive queries.

    Returns ONE row: n_queries, n_pos, mrr, hits_<k> for each k.

    100 TB shape: ONE hash exchange on the query key for the rank
    window (candidate lists per query are scorer-bounded, typically
    ≤ a few thousand — no skew hazard), then a single partial
    aggregate; no driver state beyond the final 1-row collect a caller
    may do."""
    qs = [F.col(c) for c in query_cols]
    from pyspark.sql.window import Window
    w = Window.partitionBy(*qs).orderBy(F.col(score_col).desc(),
                                        F.col(cand_col).asc())
    ranked = scored.withColumn("_rank", F.row_number().over(w))
    pos = ranked.filter(F.col(label_col))
    if filtered:
        # the standard "filtered" KG protocol (Bordes et al.): when
        # ranking a positive, the query's OTHER positives don't count
        # as competitors. With unique raw ranks per query, the i-th
        # best positive has i-1 positives above it — subtract them.
        # Same (query-key) exchange as the rank window: no new shuffle.
        wp = Window.partitionBy(*qs).orderBy(F.col("_rank"))
        pos = pos.withColumn(
            "_rank", F.col("_rank") - (F.row_number().over(wp) - 1))
    aggs = [F.count(F.lit(1)).alias("n_pos"),
            F.countDistinct(*qs).alias("n_queries"),
            F.avg(F.lit(1.0) / F.col("_rank")).alias("mrr")]
    aggs += [F.avg((F.col("_rank") <= k).cast("double")).alias(f"hits_{k}")
             for k in ks]
    return pos.agg(*aggs).select(
        "n_queries", "n_pos", "mrr", *[f"hits_{k}" for k in ks])


def token_accuracy(pred_tokens: DataFrame, gold_tokens: DataFrame,
                   field: str) -> float:
    """Token-level accuracy for upos/lemma/ne (morra's evaluate_pos/
    lemma/ne analogue) joined on (conv_id, turn_idx, token_id) — B-J2."""
    keys = ["conv_id", "turn_idx", "token_id"]
    j = (pred_tokens.select(*keys, F.col(field).alias("p"))
         .join(gold_tokens.select(*keys, F.col(field).alias("g")), keys))
    row = j.agg(F.avg((F.col("p") == F.col("g")).cast("double")).alias("acc")).collect()[0]
    return float(row["acc"] or 0.0)
