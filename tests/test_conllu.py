"""CoNLL-U source/sink: parse/render round-trip + distributed read."""

from __future__ import annotations

from morra_spark.sources.conllu import (parse_conllu_text, read_conllu,
                                        render_sentence, write_conllu)

SAMPLE = """# sent_id = s1
# text = Alice founded Acme.
1\tAlice\talice\tPROPN\t_\t_\t_\t_\t_\tNE=Person
2\tfounded\tfound\tVERB\t_\tTense=Past|VerbForm=Fin\t_\t_\t_\t_
3-4\tAcme.\t_\t_\t_\t_\t_\t_\t_\t_
3\tAcme\tacme\tPROPN\t_\t_\t_\t_\t_\tNE=Org
4\t.\t.\tPUNCT\t_\t_\t_\t_\t_\t_

# sent_id = s2
1\tHello\thello\tINTJ\t_\t_\t_\t_\t_\t_
"""


def test_parse_fields_and_multiword():
    sents = parse_conllu_text(SAMPLE, "f.conllu")
    assert len(sents) == 2
    s1 = sents[0]
    assert s1["sent_id"] == "s1" and s1["text"] == "Alice founded Acme."
    ids = [t["id"] for t in s1["tokens"]]
    assert ids == ["1", "2", "3-4", "3", "4"]  # MWT range passes through
    assert s1["tokens"][0]["misc"] == {"NE": "Person"}
    assert s1["tokens"][1]["feats"] == {"Tense": "Past", "VerbForm": "Fin"}


def test_render_round_trip():
    sents = parse_conllu_text(SAMPLE)
    rendered = "\n".join(render_sentence(s["meta"], s["tokens"]) for s in sents)
    again = parse_conllu_text(rendered)
    assert [s["tokens"] for s in again] == [s["tokens"] for s in sents]
    assert [s["meta"] for s in again] == [s["meta"] for s in sents]


def test_spark_read_write_round_trip(spark, tmp_path):
    src = tmp_path / "corpus"
    src.mkdir()
    (src / "a.conllu").write_text(SAMPLE)
    (src / "b.conllu").write_text(SAMPLE.replace("s1", "s3").replace("s2", "s4"))

    df = read_conllu(spark, str(src))
    assert df.count() == 4
    row = df.filter("sent_id = 's1'").first()
    assert [t["form"] for t in row.tokens][:2] == ["Alice", "founded"]
    assert row.tokens[0]["misc"]["NE"] == "Person"

    out = str(tmp_path / "out")
    write_conllu(df, out)
    back = read_conllu(spark, out)
    assert back.count() == 4
    assert {r.sent_id for r in back.select("sent_id").collect()} == \
           {"s1", "s2", "s3", "s4"}


def test_train_from_conllu_corpus(spark, tmp_path, model):
    """Reference-native flow: export annotated turns to CoNLL-U, read the
    corpus back, and produce gold-token rows train_models() can consume —
    round-trip through the reference's own file format."""
    import pyspark.sql.functions as F

    from morra_spark.operators.tagger import annotate_turns
    from morra_spark.sources.conllu import annotated_to_conllu_rows, write_conllu
    from morra_spark.train import gold_tokens_from_conllu
    from morra_spark.fixtures import gen_full

    src = gen_full(spark, 20, seed=11).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts") \
        .filter(F.col("role") != "tool")
    ann = annotate_turns(src, spark.sparkContext.broadcast(model))
    corpus = str(tmp_path / "corpus")
    write_conllu(annotated_to_conllu_rows(ann), corpus)

    gold = gold_tokens_from_conllu(spark, corpus)
    assert len(gold) > 100
    assert set(gold.columns) == {"conv_id", "turn_idx", "token_id",
                                 "form", "lemma", "upos", "ne"}
    assert gold["upos"].isin(
        ["ADJ", "ADP", "DET", "NOUN", "PROPN", "PUNCT", "VERB"]).all()
    assert (gold["ne"] != "").all()
    # NE labels survived the MISC['NE'] round trip
    assert (gold["ne"] != "O").any()
