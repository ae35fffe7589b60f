"""FEATS tagger (SURVEY.md §2 A10) — morphological key=value features.

Morra trains one perceptron per UD category (separate mode) and a joint
model over the full feats string ([PK] morra/morph_parser.py::
train_feats/predict_feats, joint= flag). Both modes are reproduced here
over the same Arrow-batch machinery as POS/NER: static features are
scored once per batch, the greedy decode runs per category (separate) or
once over feats-strings (joint), vectorized across sequences.

Gold FEATS for the synthetic grammar are derivable by construction from
(upos, form, lemma) — ``gold_feats`` is that derivation, used both to
label training data and as the evaluation oracle (no fixture regeneration
needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FEATS_KEYS = ["Tense", "VerbForm", "Number", "Poss"]
ABSENT = "_"

FEATS_STATIC = ["form", "suf3", "shape", "first", "pform", "nform",
                "upos", "pupos", "nupos"]
FEATS_DYNAMIC = ["prev"]


def gold_feats(upos: str, form: str, lemma: str) -> dict[str, str]:
    """Deterministic by-construction FEATS for the grammar's surfaces."""
    f = form.lower()
    out: dict[str, str] = {}
    if upos == "VERB":
        if f.endswith("ing"):
            out["VerbForm"] = "Ger"
        elif f.endswith("s"):
            out["Tense"] = "Pres"
        else:
            out["Tense"] = "Past"
    elif upos == "NOUN":
        out["Number"] = "Plur" if f != lemma.lower() else "Sing"
    elif upos == "PROPN":
        if f.endswith("'s"):
            out["Poss"] = "Yes"
        out["Number"] = "Sing"
    return out


def gold_feats_str(upos: str, form: str, lemma: str) -> str:
    """Canonical joint-mode class string 'K=V|K2=V2' (sorted keys)."""
    d = gold_feats(upos, form, lemma)
    return "|".join(f"{k}={d[k]}" for k in sorted(d)) if d else ABSENT


def predict_feats_separate(models: dict, feat_ids: dict[str, np.ndarray],
                           starts: np.ndarray, n: int) -> list[dict[str, str]]:
    """Per-category decode (separate mode): each key's perceptron predicts
    its value (or ABSENT) per token; merged into one map per token.

    ``models``: key -> PerceptronModel whose classes include ABSENT.
    ``feat_ids``: family -> row-id array shared by all category models
    (same static families, same vocab layout per model is NOT assumed —
    ids are resolved per model by the caller).
    """
    merged: list[dict[str, str]] = [{} for _ in range(n)]
    for key, model in models.items():
        static = model.static_scores(feat_ids[key], n)
        pred = model.decode_batch(static, starts)
        classes = np.array(model.classes, dtype=object)
        vals = classes[pred]
        for i in range(n):
            v = vals[i]
            if v != ABSENT:
                merged[i][key] = v
    return merged


def predict_feats_joint(model, feat_ids: dict[str, np.ndarray],
                        starts: np.ndarray, n: int) -> list[dict[str, str]]:
    """Joint mode: one model over full feats strings."""
    static = model.static_scores(feat_ids, n)
    pred = model.decode_batch(static, starts)
    classes = np.array(model.classes, dtype=object)
    out: list[dict[str, str]] = []
    for i in range(n):
        s = classes[pred[i]]
        if s == ABSENT:
            out.append({})
        else:
            out.append(dict(kv.split("=", 1) for kv in s.split("|")))
    return out


def feats_static_features(shared: dict, upos: pd.Series,
                          seq_ids: np.ndarray) -> dict[str, pd.Series]:
    """Static families for FEATS models: reuses the shared batch features
    plus predicted UPOS context (morra parity: feats features consume the
    POS cascade's output)."""
    from morra_spark.operators.features import BOS, EOS, _shift_with_sentinel

    idx = upos.index
    upos_np = upos.to_numpy(dtype=object)
    return {
        "form": shared["form"],
        "suf3": shared["suf3"],
        "shape": shared["shape"],
        "first": shared["first"],
        "pform": shared["pform"],
        "nform": shared["nform"],
        "upos": upos,
        "pupos": pd.Series(_shift_with_sentinel(upos_np, seq_ids, 1, BOS), index=idx),
        "nupos": pd.Series(_shift_with_sentinel(upos_np, seq_ids, -1, EOS), index=idx),
    }
