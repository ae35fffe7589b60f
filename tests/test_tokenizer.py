from morra_spark.operators.tokenizer import detokenize, tokenize_one


def test_offsets_are_byte_exact():
    text = "Vertex Corp certifying Gearbox Mini's in Oslo."
    toks = tokenize_one(text)
    for start, length, form in toks:
        assert text[start:start + length] == form


def test_possessive_is_one_token():
    toks = tokenize_one("Haddad's plan.")
    assert [f for _, _, f in toks] == ["Haddad's", "plan", "."]


def test_punct_split_and_json():
    toks = tokenize_one('{"status": "ok", "n": 42}')
    forms = [f for _, _, f in toks]
    assert "status" in forms and "{" in forms and "42" in forms


def test_empty_and_whitespace():
    assert tokenize_one("") == []
    assert tokenize_one("   \t\n ") == []


def test_detokenize_roundtrip():
    text = "Alice  Johnson\tfounded   Acme Corp."
    toks = tokenize_one(text)
    spans = [(s, ln) for s, ln, _ in toks]
    assert detokenize(text, spans) == text.strip()
