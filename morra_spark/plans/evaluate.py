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


def token_accuracy(pred_tokens: DataFrame, gold_tokens: DataFrame,
                   field: str) -> float:
    """Token-level accuracy for upos/lemma/ne (morra's evaluate_pos/
    lemma/ne analogue) joined on (conv_id, turn_idx, token_id) — B-J2."""
    keys = ["conv_id", "turn_idx", "token_id"]
    j = (pred_tokens.select(*keys, F.col(field).alias("p"))
         .join(gold_tokens.select(*keys, F.col(field).alias("g")), keys))
    row = j.agg(F.avg((F.col("p") == F.col("g")).cast("double")).alias("acc")).collect()[0]
    return float(row["acc"] or 0.0)
