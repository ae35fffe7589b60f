"""The fused annotation stage: tokenize → POS → lemma → NER → mentions →
triples, in ONE map-only Arrow pass.

This is the engine's hot loop (SURVEY.md §2 A5–A12, §4.3). Everything
that is turn-local stays inside the row: token arrays, mention spans and
candidate triples are computed per Arrow batch with numpy-vectorized
scoring (broadcast model weights, zero per-row Python UDFs) and emitted
as nested columns — so the stage is pipelined map tasks with NO shuffle,
which is exactly what keeps N→4N scaling efficiency ≥ 0.8: the only
exchanges in the flagship plan are the ones the plan *wants*
(SURVEY.md §4.3).

Morra parity: the cascade order (POS → lemma → NER, NER consuming
predicted POS/lemma-adjacent features) mirrors
[PK] morra/morph_parser*.py::predict / predict_sents; the greedy
left-to-right decode with predicted-prev-tag features mirrors
[PK] morra/base_parser.py::_AveragedPerceptron.predict — but batched
across all turns of an Arrow batch instead of one token at a time.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from morra_spark.operators import features as FT
from morra_spark.operators.lemmatizer import lemmatize
from morra_spark.operators.spans import assemble_mentions_and_triples
from morra_spark.operators.tokenizer import tokenize_one

TOKENS_FIELD = ("array<struct<token_id:int,start:int,len:int,form:string,"
                "lemma:string,upos:string,feats:map<string,string>,ne:string>>")
MENTIONS_FIELD = ("array<struct<mention_id:int,tok_start:int,tok_end:int,"
                  "surface:string,lemma_norm:string,ne_type:string>>")
TRIPLES_FIELD = ("array<struct<subj:string,pred:string,obj:string,"
                 "subj_ne:string,obj_ne:string>>")

ANNOTATED_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    f" ts timestamp, tokens {TOKENS_FIELD}, mentions {MENTIONS_FIELD},"
    f" triples {TRIPLES_FIELD}"
)

# slim output for the triple path: Catalyst cannot prune columns through
# an opaque mapInPandas, so the pruning is done HERE — the flagship never
# pays Arrow transfer + JVM row conversion for token/mention arrays it
# drops one operator later (SURVEY.md §4.2 "select-narrow before B-U2")
TRIPLES_ONLY_SCHEMA = f"conv_id string, turn_idx int, triples {TRIPLES_FIELD}"


def _annotate_pdf(pdf: pd.DataFrame, model, triples_only: bool = False) -> pd.DataFrame:
    """Annotate one Arrow batch of turn rows. Pure function of (batch,
    broadcast model) — unit-testable without Spark."""
    texts = pdf["text"].astype(str).tolist()
    tok_lists = [tokenize_one(t) for t in texts]

    counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
    starts = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    n = int(starts[-1])

    forms = pd.Series(
        [f for toks in tok_lists for (_s, _l, f) in toks], dtype=object)
    seq_ids = np.repeat(np.arange(len(counts)), counts)

    if n:
        # POS (A5-A7): static features once, greedy decode across the batch
        shared = FT.shared_static(forms, seq_ids)
        pos_feats = FT.pos_static_features(forms, seq_ids, model.dict_tag,
                                           shared=shared)
        pos_ids = FT.features_to_ids(model.pos, pos_feats)
        pos_static = model.pos.static_scores(pos_ids, n)
        upos = pd.Series(
            np.array(model.pos.classes, dtype=object)[
                model.pos.decode_batch(pos_static, starts)],
            dtype=object)
        # Lemma (A9): dict-first + suffix rules, plain-lowercase keys
        lemma = lemmatize(forms.str.lower(), upos, model.lemma_rules)
        # NER (A11): consumes predicted POS, gazetteer hints
        ner_feats = FT.ner_static_features(forms, upos, seq_ids, model.gazetteer,
                                           shared=shared)
        ner_ids = FT.features_to_ids(model.ner, ner_feats)
        ner_static = model.ner.static_scores(ner_ids, n)
        ne = np.array(model.ner.classes, dtype=object)[
            model.ner.decode_batch(ner_static, starts)]
        # NER separate + combine (A12): per-type binary margins overrule
        # the joint decision only on confident disagreement
        ner_sep = getattr(model, "ner_sep", None)
        if ner_sep and model.meta.get("ner_mode") == "combine":
            from morra_spark.operators.ner_combine import (binary_margins,
                                                           combine_joint_separate)

            ids_per = {t: FT.features_to_ids(m, ner_feats)
                       for t, m in ner_sep.items()}
            types, margins = binary_margins(ner_sep, ids_per, starts, n)
            ne = combine_joint_separate(ne, None, types, margins)
        # FEATS (A10): per-category perceptrons over the POS cascade
        feats_sep = getattr(model, "feats_sep", None)
        if feats_sep and not triples_only:
            from morra_spark.operators import feats as FE

            fe_static = FE.feats_static_features(shared, upos, seq_ids)
            fe_ids = {k: FT.features_to_ids(m, fe_static)
                      for k, m in feats_sep.items()}
            feats_list = FE.predict_feats_separate(feats_sep, fe_ids, starts, n)
        else:
            feats_list = None
        upos_np = upos.to_numpy(dtype=object)
        lemma_np = lemma.to_numpy(dtype=object)
    else:
        upos_np = lemma_np = ne = np.empty(0, dtype=object)
        feats_list = None

    tokens_col, mentions_col, triples_col = [], [], []
    for i, toks in enumerate(tok_lists):
        s, e = int(starts[i]), int(starts[i + 1])
        trow = [
            {"token_id": j, "start": st, "len": ln, "form": f,
             "lemma": lemma_np[s + j], "upos": upos_np[s + j],
             "feats": feats_list[s + j] if feats_list is not None else {},
             "ne": ne[s + j]}
            for j, (st, ln, f) in enumerate(toks)
        ]
        mentions, triples = assemble_mentions_and_triples(trow, texts[i])
        triples_col.append(triples)
        if not triples_only:
            tokens_col.append(trow)
            mentions_col.append(mentions)

    if triples_only:
        out = pdf[["conv_id", "turn_idx"]].copy()
        out["triples"] = triples_col
        return out
    out = pdf[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].copy()
    out["tokens"] = tokens_col
    out["mentions"] = mentions_col
    out["triples"] = triples_col
    return out


def annotate_turns(df: DataFrame, model_bc) -> DataFrame:
    """transcripts → turns_annotated (tokens + mentions + triples nested).

    ``model_bc``: a ``Broadcast[KGModel]``. Map-only; no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = model_bc.value
        for pdf in batches:
            if len(pdf):
                yield _annotate_pdf(pdf, model)

    return df.mapInPandas(run, schema=ANNOTATED_SCHEMA)


def extract_turn_triples(df: DataFrame, model_bc) -> DataFrame:
    """transcripts → (conv_id, turn_idx, triples) — the slim flagship
    stage. Same cascade, but only the triple arrays cross the Arrow
    boundary (≈5× less transfer + JVM row-conversion than full
    annotation). Input should be pre-filtered (role != 'tool') so the
    predicate runs JVM-side BEFORE the Python stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = model_bc.value
        for pdf in batches:
            if len(pdf):
                yield _annotate_pdf(pdf, model, triples_only=True)

    # 3-column input: role/tool/ts never cross into Python either
    return df.select("conv_id", "turn_idx", "text") \
             .mapInPandas(run, schema=TRIPLES_ONLY_SCHEMA)
