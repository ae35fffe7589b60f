"""Feature templates for the POS and NER taggers.

Honnibal-style templates in the spirit of morra's feature extractors
([PK] morra/features.py::Features — wform, suffixes, prefix,
capitalization, neighbor words, corpus-dict tag guess, previous predicted
tags; SURVEY.md §2 A6), implemented ONCE as vectorized pandas/numpy
column ops and shared verbatim by training (driver, tiny data) and
inference (executor Arrow batches) — a single code path means zero
train/serve drift.

All functions take flat token arrays laid out sequence-after-sequence
with a ``seq_ids`` array marking which sequence each token belongs to;
neighbor features are computed by shifting with boundary sentinels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BOS = "<S>"
EOS = "</S>"

POS_STATIC = ["form", "suf3", "suf4", "pre1", "shape", "first", "pform", "nform", "dguess"]
POS_DYNAMIC = ["prev", "prev2"]
NER_STATIC = ["form", "suf3", "shape", "first", "pform", "nform",
              "upos", "pupos", "nupos", "gaz", "pgaz", "ngaz"]
NER_DYNAMIC = ["prev"]


def normalize_forms(forms: pd.Series) -> pd.Series:
    """Lowercase + fold digit runs (morra's wform normalization)."""
    return forms.str.lower().str.replace(r"\d+", "0", regex=True)


def _shift_with_sentinel(vals: np.ndarray, seq_ids: np.ndarray, k: int,
                         sentinel: str) -> np.ndarray:
    """Value k positions away within the same sequence, else sentinel."""
    n = len(vals)
    out = np.full(n, sentinel, dtype=object)
    if n == 0 or k == 0:
        return vals.copy() if k == 0 else out
    if k > 0:  # previous token (look back)
        same = np.zeros(n, bool)
        same[k:] = seq_ids[k:] == seq_ids[:-k]
        out[same] = vals[np.nonzero(same)[0] - k]
    else:  # next token (look ahead)
        k = -k
        same = np.zeros(n, bool)
        same[:-k] = seq_ids[:-k] == seq_ids[k:]
        out[same] = vals[np.nonzero(same)[0] + k]
    return out


def _shape(forms: pd.Series) -> pd.Series:
    is_digit = forms.str.fullmatch(r"\d+")
    is_punct = forms.str.fullmatch(r"[^\w\s]+")
    cap_first = forms.str.match(r"[A-Z]")
    all_upper = forms.str.fullmatch(r"[A-Z0-9']+")
    return pd.Series(
        np.select(
            [is_digit.to_numpy(), is_punct.to_numpy(), all_upper.to_numpy(),
             cap_first.to_numpy()],
            ["digit", "punct", "upper", "cap"],
            default="lower",
        ),
        index=forms.index,
    )


def _is_first(seq_ids: np.ndarray) -> np.ndarray:
    n = len(seq_ids)
    first = np.ones(n, dtype=object)
    first[:] = "0"
    if n:
        first[0] = "1"
        first[1:][seq_ids[1:] != seq_ids[:-1]] = "1"
    return first


def shared_static(forms: pd.Series, seq_ids: np.ndarray) -> dict:
    """Families used by BOTH taggers, computed once per Arrow batch (the
    feature *values* are identical either way — this is pure reuse)."""
    fn = normalize_forms(forms)
    fn_np = fn.to_numpy(dtype=object)
    idx = forms.index
    return {
        "form": fn,
        "fn_np": fn_np,
        "suf3": fn.str[-3:],
        "shape": _shape(forms),
        "first": pd.Series(_is_first(seq_ids), index=idx),
        "pform": pd.Series(_shift_with_sentinel(fn_np, seq_ids, 1, BOS), index=idx),
        "nform": pd.Series(_shift_with_sentinel(fn_np, seq_ids, -1, EOS), index=idx),
    }


def pos_static_features(forms: pd.Series, seq_ids: np.ndarray,
                        dict_tag: dict[str, str],
                        shared: dict | None = None) -> dict[str, pd.Series]:
    """Static POS families; ``dict_tag`` is the corpus-dict most-frequent
    UPOS per normalized form (morra's ``guess_pos`` hook analogue)."""
    sh = shared if shared is not None else shared_static(forms, seq_ids)
    fn = sh["form"]
    return {
        "form": fn,
        "suf3": sh["suf3"],
        "suf4": fn.str[-4:],
        "pre1": fn.str[:1],
        "shape": sh["shape"],
        "first": sh["first"],
        "pform": sh["pform"],
        "nform": sh["nform"],
        "dguess": fn.map(dict_tag).fillna("NA"),
    }


def ner_static_features(forms: pd.Series, upos: pd.Series, seq_ids: np.ndarray,
                        gazetteer: dict[str, str],
                        shared: dict | None = None) -> dict[str, pd.Series]:
    """Static NER families; ``gazetteer`` maps normalized token form →
    NE-type hint (from the entity dictionary), morra's cdict-feature
    analogue for NER."""
    sh = shared if shared is not None else shared_static(forms, seq_ids)
    fn = sh["form"]
    idx = forms.index
    upos_np = upos.to_numpy(dtype=object)
    gaz = fn.map(gazetteer).fillna("O")
    gaz_np = gaz.to_numpy(dtype=object)
    return {
        "form": fn,
        "suf3": sh["suf3"],
        "shape": sh["shape"],
        "first": sh["first"],
        "pform": sh["pform"],
        "nform": sh["nform"],
        "upos": upos,
        "pupos": pd.Series(_shift_with_sentinel(upos_np, seq_ids, 1, BOS), index=idx),
        "nupos": pd.Series(_shift_with_sentinel(upos_np, seq_ids, -1, EOS), index=idx),
        "gaz": gaz,
        "pgaz": pd.Series(_shift_with_sentinel(gaz_np, seq_ids, 1, BOS), index=idx),
        "ngaz": pd.Series(_shift_with_sentinel(gaz_np, seq_ids, -1, EOS), index=idx),
    }


POS2_STATIC = ["form", "suf3", "shape", "first",
               "f1p", "f1", "f1n", "b1p", "b1", "b1n"]
POS2_DYNAMIC = ["prev"]


def pos2_static_features(shared: dict, fwd: pd.Series, bwd: pd.Series,
                         seq_ids: np.ndarray) -> dict[str, pd.Series]:
    """A8 level-2 POS families: the level-1 forward AND backward
    predictions at i-1/i/i+1 (morra's MorphParser2 consumes both level-1
    passes, including FUTURE context the greedy level-1 cannot see)."""
    idx = fwd.index
    f_np = fwd.to_numpy(dtype=object)
    b_np = bwd.to_numpy(dtype=object)
    return {
        "form": shared["form"],
        "suf3": shared["suf3"],
        "shape": shared["shape"],
        "first": shared["first"],
        "f1": fwd,
        "f1p": pd.Series(_shift_with_sentinel(f_np, seq_ids, 1, BOS), index=idx),
        "f1n": pd.Series(_shift_with_sentinel(f_np, seq_ids, -1, EOS), index=idx),
        "b1": bwd,
        "b1p": pd.Series(_shift_with_sentinel(b_np, seq_ids, 1, BOS), index=idx),
        "b1n": pd.Series(_shift_with_sentinel(b_np, seq_ids, -1, EOS), index=idx),
    }


def features_to_ids(model, feats: dict[str, pd.Series]) -> dict[str, np.ndarray]:
    """Map feature-string Series to weight-row id arrays (OOV → last row)."""
    out = {}
    for name, series in feats.items():
        fam = model.families[name]
        oov = len(fam.vocab)
        out[name] = series.map(fam.vocab).fillna(oov).to_numpy(np.int64)
    return out


def build_vocabs(feat_table: dict[str, pd.Series], classes: list[str],
                 dynamic: list[str]) -> dict[str, dict[str, int]]:
    """Family vocabs from training features + dynamic tag families."""
    vocabs = {}
    for name, series in feat_table.items():
        vals = sorted(series.dropna().unique().tolist())
        vocabs[name] = {v: i for i, v in enumerate(vals)}
    for name in dynamic:
        vals = sorted(set(classes)) + [BOS]
        vocabs[name] = {v: i for i, v in enumerate(vals)}
    return vocabs
