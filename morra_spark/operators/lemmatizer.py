"""Dictionary + suffix-rule lemmatizer, vectorized.

Capability parity with morra's lemmatization (SURVEY.md §2 A9,
[PK] morra/morph_parser.py::MorphParser.predict_lemma +
corpuscula CorpusDict.predict_lemma): dictionary first on
``(normalized form, predicted UPOS)``, then form-only dictionary
fallback, then longest-matching learned suffix-transformation rule for
OOV forms, finally identity. All paths are pandas/numpy column ops over
the whole Arrow batch — no per-token Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# NB: must not be "\x00" — numpy's fixed-width string kernels drop NUL
# bytes during Series concatenation, silently breaking every dict lookup.
SEP = "\x1f"


class LemmaRules:
    """Broadcast-able lemmatization tables (part of the model artifact)."""

    def __init__(self, form_upos_lemma: dict[str, str], form_lemma: dict[str, str],
                 suffix_rules: list[tuple[str, str, str, int]]) -> None:
        # keys: f"{form_norm}{SEP}{upos}" -> lemma ; form_norm -> lemma
        self.form_upos_lemma = form_upos_lemma
        self.form_lemma = form_lemma
        # longest suffix first, then frequency — first hit wins
        self.suffix_rules = sorted(
            suffix_rules, key=lambda r: (-len(r[1]), -r[3], r[0], r[1]))


def lemmatize(forms_norm: pd.Series, upos: pd.Series, rules: LemmaRules) -> pd.Series:
    lemma = (forms_norm + SEP + upos).map(rules.form_upos_lemma)
    miss = lemma.isna()
    if miss.any():
        lemma[miss] = forms_norm[miss].map(rules.form_lemma)
        miss = lemma.isna()
    if miss.any():
        out = lemma.to_numpy(dtype=object)
        fn = forms_norm.to_numpy(dtype=object)
        up = upos.to_numpy(dtype=object)
        todo = miss.to_numpy()
        for rule_upos, suffix, replace, _freq in rules.suffix_rules:
            if not todo.any():
                break
            fn_sub = pd.Series(fn[todo])
            hit = (fn_sub.str.endswith(suffix)
                   & (pd.Series(up[todo]) == rule_upos)
                   & (fn_sub.str.len() > len(suffix))).to_numpy()
            if hit.any():
                idx = np.nonzero(todo)[0][hit]
                cut = fn_sub[hit].str[: -len(suffix)] + replace
                out[idx] = cut.to_numpy(dtype=object)
                todo[idx] = False
        still = pd.isna(out.astype(object))
        out[still] = fn[still]
        lemma = pd.Series(out, index=forms_norm.index)
    return lemma
