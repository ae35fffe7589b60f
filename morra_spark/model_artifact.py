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
    meta: dict = field(default_factory=dict)

    def save(self, path: str) -> None:
        self.pos.strip_for_broadcast()
        self.ner.strip_for_broadcast()
        with open(path, "wb") as f:
            pickle.dump(self, f, protocol=4)

    @staticmethod
    def load(path: str) -> "KGModel":
        with open(path, "rb") as f:
            return pickle.load(f)
