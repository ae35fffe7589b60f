"""A10 FEATS tagger + A12 separate-NER combine: derivation, training
accuracy, and combination semantics."""

from __future__ import annotations

import numpy as np

from morra_spark.operators.feats import ABSENT, gold_feats, gold_feats_str
from morra_spark.operators.ner_combine import combine_joint_separate


def test_gold_feats_derivation():
    assert gold_feats("VERB", "founded", "found") == {"Tense": "Past"}
    assert gold_feats("VERB", "founds", "found") == {"Tense": "Pres"}
    assert gold_feats("VERB", "founding", "found") == {"VerbForm": "Ger"}
    assert gold_feats("VERB", "built", "build") == {"Tense": "Past"}
    assert gold_feats("NOUN", "berries", "berry") == {"Number": "Plur"}
    assert gold_feats("NOUN", "report", "report") == {"Number": "Sing"}
    assert gold_feats("PROPN", "Acme's", "acme") == {"Poss": "Yes", "Number": "Sing"}
    assert gold_feats("DET", "the", "the") == {}
    assert gold_feats_str("PROPN", "Acme's", "acme") == "Number=Sing|Poss=Yes"
    assert gold_feats_str("ADP", "in", "in") == ABSENT


def test_combine_overturns_joint_O():
    joint = np.array(["O", "O", "Person"], dtype=object)
    jm = np.zeros(3)
    types = ["Org", "Person"]
    margins = np.array([[2.0, -1.0],   # Org confident -> overturn O
                        [-1.0, -2.0],  # nothing positive -> stays O
                        [-0.5, 3.0]],  # joint Person, own margin positive
                       np.float32)
    out = combine_joint_separate(joint, jm, types, margins)
    assert out.tolist() == ["Org", "O", "Person"]


def test_combine_switches_on_strong_disagreement():
    joint = np.array(["Person"], dtype=object)
    types = ["Org", "Person"]
    # joint says Person, Person-model margin negative, Org strongly positive
    margins = np.array([[4.0, -2.0]], np.float32)
    out = combine_joint_separate(joint, np.zeros(1), types, margins)
    assert out.tolist() == ["Org"]


def test_trained_model_has_feats_and_sep(model):
    """The shipped artifact carries A10/A12 heads with high train acc."""
    assert getattr(model, "feats_sep", None), "retrain models/kg_model.pkl"
    assert getattr(model, "ner_sep", None)
    accs = model.meta.get("train_acc_feats", {})
    assert accs and min(accs.values()) >= 0.95, accs
    assert min(model.meta["train_acc_ne_sep"].values()) >= 0.98


def test_feats_inference_matches_derivation(spark, fixture_dir, model):
    """Full annotation emits feats; ≥0.98 token accuracy vs derived gold."""
    import pyspark.sql.functions as F

    from morra_spark.operators.tagger import annotate_turns

    bc = spark.sparkContext.broadcast(model)
    tr = spark.read.parquet(f"{fixture_dir}/transcripts") \
        .filter(F.col("role") != "tool").limit(400)
    ann = annotate_turns(tr, bc)
    pred = (ann.select("conv_id", "turn_idx", F.explode("tokens").alias("t"))
            .select("conv_id", "turn_idx", "t.token_id",
                    F.to_json("t.feats").alias("feats_json")).toPandas())
    gold = spark.read.parquet(f"{fixture_dir}/gold_tokens").toPandas()
    import json
    merged = pred.merge(gold, on=["conv_id", "turn_idx", "token_id"])
    assert len(merged) == len(pred)
    ok = 0
    for _, r in merged.iterrows():
        got = json.loads(r.feats_json) if r.feats_json else {}
        want = gold_feats(r.upos, r.form, r.lemma)
        ok += got == want
    assert ok / len(merged) >= 0.98, ok / len(merged)


def test_two_pass_pos_accuracy(spark, fixture_dir, model):
    """A8: level-2 two-pass POS matches gold ≥ level-1 on fixtures."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.functions as F

    from morra_spark.operators.tagger import _annotate_pdf

    assert getattr(model, "pos2", None) is not None, "retrain models/kg_model.pkl"
    assert model.meta["train_acc_pos2"] >= 0.99

    tr = (spark.read.parquet(f"{fixture_dir}/transcripts")
          .filter(F.col("role") != "tool").limit(300).toPandas())
    gold = spark.read.parquet(f"{fixture_dir}/gold_tokens").toPandas()

    model.meta["ner_mode"] = None
    model.meta["pos_mode"] = "two_pass"
    try:
        out = _annotate_pdf(tr, model)
    finally:
        model.meta.pop("pos_mode", None)
    rows = []
    for _, r in out.iterrows():
        for t in r["tokens"]:
            rows.append((r["conv_id"], r["turn_idx"], t["token_id"], t["upos"]))
    pred = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "token_id", "upos2"])
    merged = pred.merge(gold, on=["conv_id", "turn_idx", "token_id"])
    assert len(merged) == len(pred)
    acc = (merged["upos2"] == merged["upos"]).mean()
    assert acc >= 0.98, acc
