"""Offline model training → ``models/kg_model.pkl``.

Morra-parity training loop (SURVEY.md §2 A4/A7/A11: greedy structured
averaged perceptron, predicted-prev-tag features, epoch shuffling,
weights averaged at the end) on the deterministic grammar fixtures.
Driver-side, tiny data by design — the production pipeline only ever
*loads* the artifact and broadcasts it (SURVEY.md §2 A14: training is an
offline artifact-prep step, out of the hot path).

NER is trained on *predicted* POS, not gold, so the tagger cascade sees
identical feature distributions at train and serve time.

Usage: python -m morra_spark.train [--convs 800] [--out models/kg_model.pkl]
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from morra_spark.grammar import Lexicon
from morra_spark.model_artifact import KGModel
from morra_spark.operators import features as FT
from morra_spark.operators.lemmatizer import SEP, LemmaRules, lemmatize
from morra_spark.operators.perceptron import PerceptronModel

POS_CLASSES = ["ADJ", "ADP", "DET", "NOUN", "PROPN", "PUNCT", "VERB"]
NE_CLASSES = ["Location", "O", "Org", "Person", "Product"]


def build_dicts(lex: Lexicon):
    """Corpus-dict analogues from the grammar lexicon (A3)."""
    dict_tag: dict[str, str] = {}
    form_upos_lemma: dict[str, str] = {}
    form_lemma: dict[str, str] = {}
    for form, (lemma, upos) in sorted(lex.token_lemma.items()):
        fn = form.lower()
        dict_tag.setdefault(fn, upos)
        form_upos_lemma.setdefault(f"{fn}{SEP}{upos}", lemma)
        form_lemma.setdefault(fn, lemma)
    gazetteer: dict[str, str] = {}
    for canon, variants in sorted(lex.entities.items()):
        ne = lex.entity_type[canon]
        for var in variants:
            for tok in var:
                t = tok.lower()
                gazetteer.setdefault(t, ne)
                # possessive-stripped key too: variant sets differ between
                # lexicon seeds, but the bare form is always a valid hint
                if t.endswith("'s"):
                    gazetteer.setdefault(t[:-2], ne)
                else:
                    gazetteer.setdefault(t + "'s", ne)
    # alias -> canonical map for the linker (code-review r5: the old
    # identity map made link_endpoints provably a no-op). Three key
    # classes per entity: the canonical span itself (identity — an
    # already-canonical endpoint links to itself), every variant's
    # lemma-normalized span (what extraction emits when the token
    # dictionary covered it — usually identity on this grammar), and
    # every RAW lowercased variant span (what extraction emits when
    # token-level lemmatization MISSED, e.g. an OOV possessive the
    # suffix rules didn't strip) — the non-identity entries that give
    # the dictionary join real work on imperfect input.
    entity_canon = {c: c for c in lex.entity_type}
    for canon, variants in sorted(lex.entities.items()):
        for var in variants:
            raw = " ".join(t.lower() for t in var)
            lemmed = " ".join(lex.token_lemma.get(t, (t.lower(),))[0]
                              for t in var)
            entity_canon.setdefault(raw, canon)
            entity_canon.setdefault(lemmed, canon)
    return dict_tag, form_upos_lemma, form_lemma, gazetteer, entity_canon


def _to_token_dicts(feats: dict[str, pd.Series], starts: np.ndarray) -> list[list[dict]]:
    """Flat feature columns → per-sequence per-token {family: value}."""
    names = list(feats)
    cols = [feats[n].to_numpy(dtype=object) for n in names]
    out = []
    for s, e in zip(starts[:-1], starts[1:]):
        out.append([
            {n: c[i] for n, c in zip(names, cols)} for i in range(s, e)
        ])
    return out


def train_models(gold: pd.DataFrame, lex: Lexicon, epochs: int = 5, seed: int = 42):
    """``gold``: gold_tokens rows (conv_id, turn_idx, token_id, form,
    lemma, upos, ne) sorted by (conv_id, turn_idx, token_id)."""
    gold = gold.sort_values(["conv_id", "turn_idx", "token_id"], kind="stable")
    gold = gold.reset_index(drop=True)
    dict_tag, ful, fl, gazetteer, entity_canon = build_dicts(lex)

    seq_key = gold["conv_id"].astype(str) + "\x1f" + gold["turn_idx"].astype(str)
    seq_change = np.ones(len(gold), bool)
    seq_change[1:] = seq_key.to_numpy()[1:] != seq_key.to_numpy()[:-1]
    seq_ids = np.cumsum(seq_change) - 1
    starts = np.concatenate([np.nonzero(seq_change)[0], [len(gold)]])

    forms = gold["form"].astype(str)

    # ---- POS ----
    shared = FT.shared_static(forms, seq_ids)
    pos_feats = FT.pos_static_features(forms, seq_ids, dict_tag, shared=shared)
    pos_vocabs = FT.build_vocabs(pos_feats, POS_CLASSES, FT.POS_DYNAMIC)
    pos = PerceptronModel.init(POS_CLASSES, pos_vocabs)
    sent_feats = _to_token_dicts(pos_feats, starts)
    gold_pos = [gold["upos"].to_numpy()[s:e].tolist() for s, e in zip(starts[:-1], starts[1:])]
    acc_pos = pos.train(sent_feats, gold_pos, epochs=epochs, seed=seed)

    # predicted POS for the NER cascade (identical to serve time)
    ids = FT.features_to_ids(pos, pos_feats)
    static = pos.static_scores(ids, len(gold))
    pred_pos_ids = pos.decode_batch(static, starts)
    pred_pos = pd.Series(np.array(POS_CLASSES, dtype=object)[pred_pos_ids],
                         index=gold.index)

    # ---- POS level-2 (A8): backward level-1 + two-pass ensemble ----
    # [PK] morra/morph_parser2.py::MorphParser2 — a rev=True level-1
    # model plus a second level consuming both passes' predictions
    pos_rev = PerceptronModel.init(POS_CLASSES, FT.build_vocabs(
        pos_feats, POS_CLASSES, FT.POS_DYNAMIC))
    acc_pos_rev = pos_rev.train(sent_feats, gold_pos, epochs=epochs,
                                seed=seed, reverse=True)
    rev_static = pos_rev.static_scores(FT.features_to_ids(pos_rev, pos_feats),
                                       len(gold))
    pred_bwd = pd.Series(np.array(POS_CLASSES, dtype=object)[
        pos_rev.decode_batch(rev_static, starts, reverse=True)],
        index=gold.index)
    pos2_feats = FT.pos2_static_features(shared, pred_pos, pred_bwd, seq_ids)
    pos2 = PerceptronModel.init(POS_CLASSES, FT.build_vocabs(
        pos2_feats, POS_CLASSES, FT.POS2_DYNAMIC))
    pos2_sent = _to_token_dicts(pos2_feats, starts)
    acc_pos2 = pos2.train(pos2_sent, gold_pos, dynamic=("prev",),
                          epochs=epochs, seed=seed)

    # ---- NER, joint (A11) ----
    ner_feats = FT.ner_static_features(forms, pred_pos, seq_ids, gazetteer,
                                       shared=shared)
    ner_vocabs = FT.build_vocabs(ner_feats, NE_CLASSES, FT.NER_DYNAMIC)
    ner = PerceptronModel.init(NE_CLASSES, ner_vocabs)
    ner_sent_feats = _to_token_dicts(ner_feats, starts)
    gold_ne = [gold["ne"].to_numpy()[s:e].tolist() for s, e in zip(starts[:-1], starts[1:])]
    acc_ne = ner.train(ner_sent_feats, gold_ne, dynamic=("prev",), epochs=epochs, seed=seed)

    # ---- NER, separate per-type binary models (A12) ----
    # one binary perceptron per NE type over the same features ([PK]
    # morra/morph_parser_ne.py::train_ne2); combined at serve time by
    # margin argmax (operators/ner_combine.py)
    ner_sep: dict[str, PerceptronModel] = {}
    acc_sep: dict[str, float] = {}
    for ne_type in [c for c in NE_CLASSES if c != "O"]:
        classes = ["O", ne_type]
        m = PerceptronModel.init(classes, FT.build_vocabs(ner_feats, classes,
                                                          FT.NER_DYNAMIC))
        gold_bin = [[g if g == ne_type else "O" for g in sent] for sent in gold_ne]
        acc_sep[ne_type] = m.train(ner_sent_feats, gold_bin, dynamic=("prev",),
                                   epochs=epochs, seed=seed)
        ner_sep[ne_type] = m

    # ---- FEATS (A10): separate per-category + joint ----
    from morra_spark.operators import feats as FE

    fe_feats = FE.feats_static_features(shared, pred_pos, seq_ids)
    fe_sent = _to_token_dicts(fe_feats, starts)
    gold_fd = [FE.gold_feats(u, f, lm) for u, f, lm in
               zip(gold["upos"], gold["form"], gold["lemma"])]
    feats_sep: dict[str, PerceptronModel] = {}
    acc_feats: dict[str, float] = {}
    for key in FE.FEATS_KEYS:
        vals = sorted({d.get(key, FE.ABSENT) for d in gold_fd})
        if vals == [FE.ABSENT]:
            continue
        classes = sorted(set(vals) | {FE.ABSENT})
        m = PerceptronModel.init(classes, FT.build_vocabs(fe_feats, classes,
                                                          FE.FEATS_DYNAMIC))
        labels = [[gold_fd[i].get(key, FE.ABSENT) for i in range(s, e)]
                  for s, e in zip(starts[:-1], starts[1:])]
        acc_feats[key] = m.train(fe_sent, labels, dynamic=("prev",),
                                 epochs=epochs, seed=seed)
        feats_sep[key] = m

    gold_fs = [FE.gold_feats_str(u, f, lm) for u, f, lm in
               zip(gold["upos"], gold["form"], gold["lemma"])]
    joint_classes = sorted(set(gold_fs))
    feats_joint = PerceptronModel.init(
        joint_classes, FT.build_vocabs(fe_feats, joint_classes, FE.FEATS_DYNAMIC))
    joint_labels = [[gold_fs[i] for i in range(s, e)]
                    for s, e in zip(starts[:-1], starts[1:])]
    acc_feats["joint"] = feats_joint.train(fe_sent, joint_labels,
                                           dynamic=("prev",), epochs=epochs,
                                           seed=seed)

    lemma_rules = LemmaRules(ful, fl, lex.suffix_rules())
    model = KGModel(pos=pos, ner=ner, lemma_rules=lemma_rules,
                    dict_tag=dict_tag, gazetteer=gazetteer,
                    entity_canon=entity_canon, entity_type=dict(lex.entity_type),
                    ner_sep=ner_sep, feats_sep=feats_sep, feats_joint=feats_joint,
                    pos_rev=pos_rev, pos2=pos2,
                    meta={"train_acc_pos": acc_pos, "train_acc_ne": acc_ne,
                          "train_acc_pos_rev": acc_pos_rev,
                          "train_acc_pos2": acc_pos2,
                          "train_acc_ne_sep": acc_sep,
                          "train_acc_feats": acc_feats})

    # sanity: lemmatizer accuracy on gold POS. Lemma lookup uses plain
    # lowercase — digit folding is a *feature* normalization only and
    # would corrupt lemmata like "x1".
    lem = lemmatize(forms.str.lower(), gold["upos"], lemma_rules)
    acc_lemma = float((lem.to_numpy() == gold["lemma"].to_numpy()).mean())
    model.meta["train_acc_lemma"] = acc_lemma
    return model


def gold_tokens_from_conllu(spark, conllu_dir: str) -> pd.DataFrame:
    """Train directly from a CoNLL-U corpus (the reference's native
    training input, [PK] morra BaseParser.load_train_corpus): distributed
    parse → gold-token rows in the shape ``train_models`` consumes.
    MISC['NE'] carries the NE label (reference convention); multiword-
    token range rows (id like '3-4') are skipped, like the reference
    skips them for tagging."""
    from pyspark.sql import functions as F

    from morra_spark.sources.conllu import read_conllu

    sents = read_conllu(spark, conllu_dir)
    tok = (sents.select(
        F.col("doc_path").alias("conv_id"),
        F.col("sent_idx").alias("turn_idx"),
        F.posexplode("tokens").alias("token_id", "t"))
        .filter(~F.col("t.id").contains("-"))
        .select("conv_id", "turn_idx", "token_id",
                F.col("t.form").alias("form"),
                F.lower(F.col("t.lemma")).alias("lemma"),
                F.col("t.upos").alias("upos"),
                F.coalesce(F.element_at("t.misc", "NE"), F.lit("O")).alias("ne")))
    return tok.toPandas()


def main() -> None:
    import argparse
    import os
    import tempfile

    from morra_spark.fixtures import write_fixtures
    from morra_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=800)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--out", default="models/kg_model.pkl")
    ap.add_argument("--from-conllu", default=None, metavar="DIR",
                    help="train from a CoNLL-U corpus dir instead of the "
                         "synthetic grammar (reference-native input)")
    args = ap.parse_args()

    spark = get_spark("train")
    if args.from_conllu:
        gold = gold_tokens_from_conllu(spark, args.from_conllu)
    else:
        with tempfile.TemporaryDirectory() as td:
            write_fixtures(spark, td, args.convs, seed=7, shuffle_rows=False)
            gold = spark.read.parquet(f"{td}/gold_tokens").toPandas()
    model = train_models(gold, Lexicon(seed=7), epochs=args.epochs)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    model.save(args.out)
    size = os.path.getsize(args.out)
    print(f"saved {args.out} ({size/1e6:.2f} MB) meta={model.meta}")
    spark.stop()


if __name__ == "__main__":
    main()
