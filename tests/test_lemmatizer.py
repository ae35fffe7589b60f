import pandas as pd

from morra_spark.operators.lemmatizer import SEP, LemmaRules, lemmatize

RULES = LemmaRules(
    form_upos_lemma={f"went{SEP}VERB": "go"},
    form_lemma={"corp": "corp"},
    suffix_rules=[("NOUN", "ies", "y", 100), ("NOUN", "s", "", 50),
                  ("VERB", "ing", "", 80), ("PROPN", "'s", "", 90)],
)


def test_dict_first_then_fallbacks():
    forms = pd.Series(["went", "corp", "berries", "running", "haddad's", "oslo"])
    upos = pd.Series(["VERB", "PROPN", "NOUN", "VERB", "PROPN", "PROPN"])
    out = lemmatize(forms, upos, RULES).tolist()
    assert out == ["go", "corp", "berry", "runn", "haddad", "oslo"]


def test_longest_suffix_wins():
    # "ies" (len 3) must fire before "s" (len 1)
    out = lemmatize(pd.Series(["cities"]), pd.Series(["NOUN"]), RULES).tolist()
    assert out == ["city"]


def test_suffix_requires_longer_form():
    # a form equal to the suffix itself must not be emptied
    out = lemmatize(pd.Series(["s"]), pd.Series(["NOUN"]), RULES).tolist()
    assert out == ["s"]
