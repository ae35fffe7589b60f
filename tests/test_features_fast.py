"""Parity: the Arrow-kernel fast path must produce EXACTLY the same
feature-row ids (hence identical predictions) as the pandas reference
path in features.py, on real grammar text and on edge cases."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

pa = pytest.importorskip("pyarrow")

from morra_spark.grammar import Lexicon, gen_turn_text  # noqa: E402
from morra_spark.operators import features as FT  # noqa: E402
from morra_spark.operators import features_fast as FF  # noqa: E402
from morra_spark.operators.tokenizer import tokenize_one  # noqa: E402


@pytest.fixture(scope="module")
def batch(model):
    lex = Lexicon(seed=42)
    rng = random.Random(9)
    texts = [gen_turn_text(lex, rng)[0] for _ in range(300)]
    texts += ["", "X1 9000 42", "ALL'CAPS UPPER99", "...", "a"]
    # unicode edge text (ADVICE r1): cyrillic incl. ё, unicode digits,
    # unicode punctuation, superscripts, combining marks, mixed scripts
    texts += ["ёлка Ёлка ЁЛКА жюри", "١٢٣ ٤٥ 42", "«кавычки» — тире…",
              "x² y³ µ§", "áb c̈d", "日本語 テスト",
              "emoji 🙂 mix42ёz"]
    tok_lists = [tokenize_one(t) for t in texts]
    forms_list = [f for toks in tok_lists for (_s, _l, f) in toks]
    counts = np.array([len(t) for t in tok_lists])
    seq_ids = np.repeat(np.arange(len(counts)), counts)
    starts = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    return forms_list, seq_ids, starts


def test_pos_ids_parity(model, batch):
    forms_list, seq_ids, _ = batch
    forms = pd.Series(forms_list, dtype=object)
    shared = FT.shared_static(forms, seq_ids)
    ref = FT.features_to_ids(
        model.pos, FT.pos_static_features(forms, seq_ids, model.dict_tag,
                                          shared=shared))
    bf = FF.BatchFeatures(forms_list, seq_ids)
    fast = FF.pos_feature_ids(model.pos, bf, model.dict_tag)
    assert set(ref) == set(fast)
    for name in ref:
        assert (ref[name] == fast[name]).all(), name


def test_ner_ids_parity(model, batch):
    forms_list, seq_ids, starts = batch
    forms = pd.Series(forms_list, dtype=object)
    n = len(forms_list)
    shared = FT.shared_static(forms, seq_ids)

    # predicted POS via the reference path
    pos_ids = FT.features_to_ids(
        model.pos, FT.pos_static_features(forms, seq_ids, model.dict_tag,
                                          shared=shared))
    pred = model.pos.decode_batch(model.pos.static_scores(pos_ids, n), starts)
    upos = pd.Series(np.array(model.pos.classes, dtype=object)[pred])

    ref = FT.features_to_ids(
        model.ner, FT.ner_static_features(forms, upos, seq_ids,
                                          model.gazetteer, shared=shared))

    bf = FF.BatchFeatures(forms_list, seq_ids)
    tab = FF.class_row_tables(model.ner, ("upos", "pupos", "nupos"),
                              model.pos.classes)
    ctx = FF.tag_context_ids(tab, pred, seq_ids, ("upos", "pupos", "nupos"))
    fast = FF.ner_feature_ids(model.ner, bf, ctx, model.gazetteer)
    assert set(ref) == set(fast)
    for name in ref:
        assert (ref[name] == fast[name]).all(), name


def test_lemma_parity(model, batch):
    import pyarrow.compute as pc

    forms_list, seq_ids, starts = batch
    forms = pd.Series(forms_list, dtype=object)
    n = len(forms_list)
    shared = FT.shared_static(forms, seq_ids)
    pos_ids = FT.features_to_ids(
        model.pos, FT.pos_static_features(forms, seq_ids, model.dict_tag,
                                          shared=shared))
    pred = model.pos.decode_batch(model.pos.static_scores(pos_ids, n), starts)
    upos = pd.Series(np.array(model.pos.classes, dtype=object)[pred])

    from morra_spark.operators.lemmatizer import lemmatize
    ref = lemmatize(forms.str.lower(), upos, model.lemma_rules)

    forms_pa = pa.array(forms_list, pa.string())
    fast = FF.lemmatize_fast(pc.utf8_lower(forms_pa),
                             pa.array(upos.tolist(), pa.string()),
                             model.lemma_rules)
    assert (ref.to_numpy(dtype=object) == fast).all()
