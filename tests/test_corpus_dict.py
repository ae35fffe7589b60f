"""A3: distributed corpus-dict build — argmax + confidence semantics."""

from __future__ import annotations

from morra_spark.operators.corpus_dict import build_corpus_dict, tag_stats
from morra_spark.operators.lemmatizer import SEP


def _tokens(spark):
    rows = [
        ("Run", "VERB", "run"), ("run", "VERB", "run"), ("run", "NOUN", "run"),
        ("runs", "VERB", "run"), ("banks", "NOUN", "bank"),
        ("banks", "NOUN", "bank"), ("banks", "VERB", "bank"),
    ]
    return spark.createDataFrame(rows, "form string, upos string, lemma string")


def test_tag_stats_confidence(spark):
    s = {(r.form_norm, r.upos): (r.freq, round(r.conf, 3), r.rn)
         for r in tag_stats(_tokens(spark)).collect()}
    assert s[("run", "VERB")] == (2, 0.667, 1)  # case-folded: Run + run
    assert s[("run", "NOUN")][2] == 2
    assert s[("banks", "NOUN")] == (2, 0.667, 1)


def test_build_corpus_dict_argmax(spark):
    dict_tag, ful = build_corpus_dict(_tokens(spark))
    assert dict_tag["run"] == "VERB" and dict_tag["banks"] == "NOUN"
    assert ful[f"runs{SEP}VERB"] == "run"
    assert ful[f"banks{SEP}NOUN"] == "bank"


def test_min_conf_threshold(spark):
    dict_tag, _ = build_corpus_dict(_tokens(spark), min_conf=0.9)
    assert "run" not in dict_tag      # 0.667 < 0.9 -> ambiguous, excluded
    assert dict_tag["runs"] == "VERB"  # unambiguous stays
