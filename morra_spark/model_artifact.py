"""The broadcastable model artifact: taggers + dictionaries in one pickle.

Mirrors morra's single-pickle model bundle ([PK]
morra/base_parser.py::BaseParser.save/load — one file holding all
perceptrons + the corpus dict; SURVEY.md §2 A14) but stores weights as
dense per-family numpy matrices ready for vectorized gather-scoring, and
strips all training-only state before serialization — the broadcast must
stay small (≪ executor memory).

Loaded once on the driver, shipped with ``sc.broadcast``; executors never
touch the filesystem for it.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

from morra_spark.operators.lemmatizer import LemmaRules
from morra_spark.operators.perceptron import PerceptronModel


@dataclass
class KGModel:
    pos: PerceptronModel
    ner: PerceptronModel
    lemma_rules: LemmaRules
    dict_tag: dict[str, str]        # form_norm -> most frequent UPOS
    gazetteer: dict[str, str]       # form_norm -> NE-type hint
    entity_canon: dict[str, str]    # lemma_norm span -> canonical entity
    entity_type: dict[str, str]     # canonical -> NE type
    # A12: per-NE-type binary perceptrons (margin-combined with joint)
    ner_sep: dict[str, PerceptronModel] | None = None
    # A10: per-UD-category FEATS perceptrons + joint feats-string model
    feats_sep: dict[str, PerceptronModel] | None = None
    feats_joint: PerceptronModel | None = None
    # A8: backward level-1 POS + level-2 two-pass ensemble
    pos_rev: PerceptronModel | None = None
    pos2: PerceptronModel | None = None
    meta: dict = field(default_factory=dict)

    def _all_models(self):
        yield self.pos
        yield self.ner
        for d in (self.ner_sep or {}, self.feats_sep or {}):
            yield from d.values()
        for m in (self.feats_joint, self.pos_rev, self.pos2):
            if m is not None:
                yield m

    def save(self, path: str) -> None:
        for m in self._all_models():
            m.strip_for_broadcast()
        with open(path, "wb") as f:
            pickle.dump(self, f, protocol=4)

    @staticmethod
    def load(path: str) -> "KGModel":
        with open(path, "rb") as f:
            return pickle.load(f)
