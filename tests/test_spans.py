from morra_spark.operators.spans import assemble_mentions_and_triples


def tok(i, form, upos, ne, start):
    return {"token_id": i, "start": start, "len": len(form), "form": form,
            "lemma": form.lower(), "upos": upos, "ne": ne}


def build(words):
    toks, pos = [], 0
    for i, (form, upos, ne) in enumerate(words):
        toks.append(tok(i, form, upos, ne, pos))
        pos += len(form) + 1
    text = " ".join(w[0] for w in words)
    return toks, text


def test_simple_triple():
    toks, text = build([("Alice", "PROPN", "Person"), ("Kim", "PROPN", "Person"),
                        ("founded", "VERB", "O"), ("Acme", "PROPN", "Org"),
                        ("Corp", "PROPN", "Org"), (".", "PUNCT", "O")])
    mentions, triples = assemble_mentions_and_triples(toks, text)
    assert [m["surface"] for m in mentions] == ["Alice Kim", "Acme Corp"]
    assert triples == [{"subj": "alice kim", "pred": "founded", "obj": "acme corp",
                        "subj_ne": "Person", "obj_ne": "Org"}]


def test_adjacent_entities_different_types_split():
    toks, text = build([("Alice", "PROPN", "Person"), ("Acme", "PROPN", "Org")])
    mentions, _ = assemble_mentions_and_triples(toks, text)
    assert [(m["ne_type"]) for m in mentions] == ["Person", "Org"]


def test_entity_at_turn_start_and_end():
    toks, text = build([("Oslo", "PROPN", "Location")])
    mentions, triples = assemble_mentions_and_triples(toks, text)
    assert len(mentions) == 1 and mentions[0]["surface"] == "Oslo"
    assert triples == []


def test_no_cross_sentence_triples():
    toks, text = build([("Alice", "PROPN", "Person"), (".", "PUNCT", "O"),
                        ("founded", "VERB", "O"), ("Acme", "PROPN", "Org")])
    _, triples = assemble_mentions_and_triples(toks, text)
    assert triples == []


def test_verb_without_object_or_subject():
    toks, text = build([("Alice", "PROPN", "Person"), ("runs", "VERB", "O")])
    _, triples = assemble_mentions_and_triples(toks, text)
    assert triples == []


def test_two_sentences_two_triples():
    toks, text = build([
        ("Alice", "PROPN", "Person"), ("leads", "VERB", "O"),
        ("Acme", "PROPN", "Org"), (".", "PUNCT", "O"),
        ("Bob", "PROPN", "Person"), ("joins", "VERB", "O"),
        ("Initech", "PROPN", "Org"), (".", "PUNCT", "O")])
    _, triples = assemble_mentions_and_triples(toks, text)
    assert [(t["subj"], t["obj"]) for t in triples] == [
        ("alice", "acme"), ("bob", "initech")]
