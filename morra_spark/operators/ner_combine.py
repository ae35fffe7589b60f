"""Separate-NER scoring + joint/separate combination (SURVEY.md §2 A12).

Morra's ``predict_ne2`` trains one binary perceptron per NE type and a
second level that resolves conflicts between the per-type and joint
outputs ([PK] morra/morph_parser_ne.py). Here the per-type models score
in the same numpy pass as the joint tagger (extra weight matrices in the
same broadcast) and the combination is margin argmax:

    margin_T(token) = score_T(token) - score_O(token)   per binary model

The final label is the candidate with the strongest evidence among
{joint prediction} ∪ {types whose binary margin > 0}; a token the joint
model labels O keeps O unless some binary model is confident (positive
margin), in which case the strongest positive type wins. Pure numpy,
vectorized over the batch — no per-token Python branching in the loop.
"""

from __future__ import annotations

import numpy as np


def binary_margins(models: dict,
                   feat_ids_per_model: dict,
                   n: int) -> tuple[list[str], np.ndarray]:
    """(type order, (n_tokens, n_types) margin matrix) from the STATIC
    scores only: for a 2-class (type vs O) model the static margin is
    the dominant evidence term, and no sequence decode runs here —
    prev-tag dynamics come from the joint pass these margins are
    combined with (code-review r5: the docstring used to promise a
    greedy decode this function never performed, and an unused
    ``starts`` parameter implied one)."""
    types = sorted(models)
    M = np.zeros((n, len(types)), np.float32)
    for j, t in enumerate(types):
        m = models[t]
        static = m.static_scores(feat_ids_per_model[t], n)
        o_idx = m.classes.index("O")
        t_idx = m.classes.index(t)
        M[:, j] = static[:, t_idx] - static[:, o_idx]
    return types, M


def combine_joint_separate(joint_labels: np.ndarray, joint_margin: np.ndarray,
                           types: list[str], margins: np.ndarray) -> np.ndarray:
    """Final labels: strongest positive evidence wins; joint O is only
    overturned by a confident binary model."""
    n = len(joint_labels)
    out = joint_labels.copy()
    best_j = margins.argmax(axis=1)
    best_m = margins[np.arange(n), best_j]
    types_arr = np.array(types, dtype=object)
    # joint said O but a binary model is confidently positive
    overturn = (joint_labels == "O") & (best_m > 0)
    out[overturn] = types_arr[best_j[overturn]]
    # joint said T but its own binary model strongly disagrees AND another
    # type is strongly positive -> switch to the stronger type
    for j, t in enumerate(types):
        said_t = joint_labels == t
        own = margins[:, j]
        stronger = (best_m > 0) & (best_m > own + 1.0) & (types_arr[best_j] != t)
        switch = said_t & (own < 0) & stronger
        out[switch] = types_arr[best_j[switch]]
    return out
