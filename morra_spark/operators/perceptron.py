"""Averaged perceptron for sequence tagging — numpy-vectorized inference.

Re-expresses the capability of morra's ``_AveragedPerceptron``
([PK] morra/base_parser.py — sparse ``dict[feature → dict[class → float]]``
weights with totals/timestamps averaging; see SURVEY.md §2 A4/A5) in a
layout built for Spark's execution model:

* weights are stored **per feature family** as dense
  ``(vocab+1, n_classes)`` float32 matrices (the +1 row is OOV, never
  updated, stays zero) — so inference is embedding-style numpy gathers
  over integer id arrays, zero feature-string construction in the hot
  path;
* training is driver-side, tiny-data, pure Python/numpy (morra parity:
  greedy left-to-right with *predicted* previous tags, ±1 updates,
  totals/timestamps averaging, epoch shuffling with a fixed seed);
* inference is ``decode_batch`` — greedy left-to-right like the
  reference, but vectorized ACROSS all sequences in an Arrow batch: the
  position-step loop runs ``max_len`` numpy steps regardless of batch
  size. This is what makes the tagger a map-only Spark stage with
  broadcast weights (BASELINE.json north_star: "broadcast model weights
  (no per-row Python)").

The dynamic families are ``prev`` / ``prev2`` (previous one/two predicted
tags), applied inside the step loop; every other family is static and
scored once per batch.
"""

from __future__ import annotations

import pickle
import random
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Family:
    """One feature family: string vocab → row ids into a weight matrix."""

    vocab: dict[str, int]
    w: np.ndarray  # (len(vocab)+1, n_classes) float32; last row = OOV (zeros)
    # training-only state (stripped before broadcast):
    totals: np.ndarray | None = None
    tstamps: np.ndarray | None = None

    def id_of(self, feat: str) -> int:
        return self.vocab.get(feat, len(self.vocab))


@dataclass
class PerceptronModel:
    classes: list[str]
    families: dict[str, Family]
    bias: np.ndarray  # (n_classes,)
    bias_totals: np.ndarray | None = None
    # per-CLASS bias timestamps (code-review r5: a single scalar here
    # skipped interval credit for every class not touched by an update,
    # skewing the averaged bias toward recently-updated classes; the
    # family weights always used per-(fid, class) tstamps)
    bias_tstamps: np.ndarray | None = None
    n_updates: int = 0
    meta: dict = field(default_factory=dict)

    # ------------------------------------------------------------------
    # training (driver-side, morra-parity greedy structured perceptron)
    # ------------------------------------------------------------------
    @classmethod
    def init(cls, classes: list[str], family_vocabs: dict[str, dict[str, int]]) -> "PerceptronModel":
        c = len(classes)
        fams = {
            name: Family(vocab=v, w=np.zeros((len(v) + 1, c), np.float32),
                         totals=np.zeros((len(v) + 1, c), np.float64),
                         tstamps=np.zeros((len(v) + 1, c), np.float64))
            for name, v in family_vocabs.items()
        }
        return cls(classes=classes, families=fams, bias=np.zeros(c, np.float32),
                   bias_totals=np.zeros(c, np.float64),
                   bias_tstamps=np.zeros(c, np.float64))

    def _score_one(self, feat_ids: dict[str, int]) -> np.ndarray:
        s = self.bias.astype(np.float64).copy()
        for name, fid in feat_ids.items():
            s += self.families[name].w[fid]
        return s

    def _update(self, feat_ids: dict[str, int], truth: int, guess: int) -> None:
        if truth == guess:
            return
        t = self.n_updates
        for name, fid in feat_ids.items():
            fam = self.families[name]
            for cls_i, delta in ((truth, 1.0), (guess, -1.0)):
                fam.totals[fid, cls_i] += (t - fam.tstamps[fid, cls_i]) * fam.w[fid, cls_i]
                fam.tstamps[fid, cls_i] = t
                fam.w[fid, cls_i] += delta
        for cls_i, delta in ((truth, 1.0), (guess, -1.0)):
            self.bias_totals[cls_i] += \
                (t - self.bias_tstamps[cls_i]) * self.bias[cls_i]
            self.bias_tstamps[cls_i] = t
            self.bias[cls_i] += delta

    def train(self, sentences: list[list[dict[str, str]]], gold: list[list[str]],
              dynamic: tuple[str, ...] = ("prev", "prev2"),
              epochs: int = 5, seed: int = 42, reverse: bool = False) -> float:
        """``sentences``: per token a dict family→feature-string (static
        families only). Dynamic prev/prev2 features are derived from
        *predicted* tags during the pass (morra parity). Returns final
        train accuracy. ``reverse=True`` trains the backward variant
        (morra's ``rev=True``): right-to-left decode, "prev" = the tag to
        the RIGHT."""
        cls_id = {c: i for i, c in enumerate(self.classes)}
        rng = random.Random(seed)
        order = list(range(len(sentences)))
        acc = 0.0
        for _ in range(epochs):
            rng.shuffle(order)
            good = total = 0
            for si in order:
                prev, prev2 = "<S>", "<S>"
                pairs = list(zip(sentences[si], gold[si]))
                if reverse:
                    pairs = pairs[::-1]
                for tok_feats, g in pairs:
                    feat_ids = {n: self.families[n].id_of(v) for n, v in tok_feats.items()}
                    if "prev" in self.families:
                        feat_ids["prev"] = self.families["prev"].id_of(prev)
                    if "prev2" in self.families:
                        feat_ids["prev2"] = self.families["prev2"].id_of(prev2)
                    self.n_updates += 1
                    guess = int(np.argmax(self._score_one(feat_ids)))
                    truth = cls_id[g]
                    self._update(feat_ids, truth, guess)
                    prev2, prev = prev, self.classes[guess]
                    good += int(guess == truth)
                    total += 1
            acc = good / max(total, 1)
        self.average()
        return acc

    def average(self) -> None:
        """Finalize averaged weights (morra's ``average_weights``)."""
        t = max(self.n_updates, 1)
        for fam in self.families.values():
            fam.totals += (t - fam.tstamps) * fam.w
            fam.w = (fam.totals / t).astype(np.float32)
            fam.totals = fam.tstamps = None
        self.bias_totals += (t - self.bias_tstamps) * self.bias
        self.bias = (self.bias_totals / t).astype(np.float32)
        self.bias_totals = self.bias_tstamps = None

    # ------------------------------------------------------------------
    # inference (executor-side, vectorized)
    # ------------------------------------------------------------------
    def static_scores(self, ids: dict[str, np.ndarray], n: int) -> np.ndarray:
        """(n, n_classes) scores from all static families at once."""
        s = np.broadcast_to(self.bias, (n, len(self.classes))).astype(np.float32).copy()
        for name, idarr in ids.items():
            s += self.families[name].w[idarr]
        return s

    def decode_batch(self, static: np.ndarray, starts: np.ndarray,
                     reverse: bool = False) -> np.ndarray:
        """Greedy decode, vectorized across sequences; L→R by default,
        R→L with ``reverse=True`` (the backward model's direction — its
        "prev" families then refer to the token on the RIGHT).

        ``static``: (n_tokens, n_classes) static scores, tokens laid out
        sequence-after-sequence; ``starts``: (n_seqs+1,) offsets of each
        sequence. Returns (n_tokens,) int class ids.

        Step p scores ALL sequences' p-th tokens in one numpy gather-add;
        the loop length is max sequence length (≈ sentence length), not
        batch size — per-token Python cost is O(1/batch).
        """
        n = static.shape[0]
        out = np.zeros(n, np.int64)
        lens = np.diff(starts)
        if n == 0:
            return out

        def cls_row_map(fam_name: str) -> np.ndarray | None:
            """class-id → family-row lookup; index -1 (=<S>) maps to the
            sentinel row via numpy negative indexing (appended last)."""
            fam = self.families.get(fam_name)
            if fam is None:
                return None
            rows = [fam.id_of(c) for c in self.classes] + [fam.id_of("<S>")]
            return np.asarray(rows, np.int64)

        map_prev, map_prev2 = cls_row_map("prev"), cls_row_map("prev2")
        w_prev = self.families["prev"].w if map_prev is not None else None
        w_prev2 = self.families["prev2"].w if map_prev2 is not None else None

        n_seqs = len(lens)
        seq_starts = starts[:-1]
        prev_cls = np.full(n_seqs, -1, np.int64)   # -1 == <S>
        prev2_cls = np.full(n_seqs, -1, np.int64)
        max_len = int(lens.max()) if n_seqs else 0
        for step in range(max_len):
            if reverse:
                # position from the END of each sequence: lens-1-step
                active = lens > step
                tok_idx = seq_starts[active] + (lens[active] - 1 - step)
            else:
                active = lens > step  # sequences still running
                tok_idx = seq_starts[active] + step
            scores = static[tok_idx]
            if w_prev is not None:
                scores = scores + w_prev[map_prev[prev_cls[active]]]
            if w_prev2 is not None:
                scores = scores + w_prev2[map_prev2[prev2_cls[active]]]
            pred = scores.argmax(axis=1)
            out[tok_idx] = pred
            prev2_cls[active] = prev_cls[active]
            prev_cls[active] = pred
        return out

    # ------------------------------------------------------------------
    def prune(self, abs_thresh: float = 1e-3) -> dict[str, int]:
        """A15 — morra's ``remove_rare_feats`` analogue ([PK]
        morra/base_parser.py): drop features whose max |averaged weight|
        is below ``abs_thresh``; shrinks the broadcast artifact. Returns
        per-family dropped-row counts. Dropped features score as OOV
        (zero row) afterwards — identical to never having seen them."""
        dropped: dict[str, int] = {}
        for name, fam in self.families.items():
            keep_mask = np.abs(fam.w[:-1]).max(axis=1) >= abs_thresh
            n_drop = int((~keep_mask).sum())
            dropped[name] = n_drop
            if n_drop == 0:
                continue
            old_rows = np.nonzero(keep_mask)[0]
            remap = {int(r): i for i, r in enumerate(old_rows)}
            new_vocab = {feat: remap[fid] for feat, fid in fam.vocab.items()
                         if fid in remap}
            new_w = np.vstack([fam.w[old_rows], fam.w[-1:]])
            fam.vocab, fam.w = new_vocab, new_w
        return dropped

    def strip_for_broadcast(self) -> "PerceptronModel":
        for fam in self.families.values():
            fam.totals = fam.tstamps = None
        self.bias_totals = None
        return self

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self.strip_for_broadcast(), f, protocol=4)

    @staticmethod
    def load(path: str) -> "PerceptronModel":
        with open(path, "rb") as f:
            return pickle.load(f)
