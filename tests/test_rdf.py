"""N-Triples interop (sources/rdf.py): byte-exact round-trips over
hostile strings, spec-pinned escaping, subset-violation accounting, and
the file-level writer/reader pair."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

NASTY = [
    'plain',
    'with spaces and\ttabs',
    'quote " inside',
    'backslash \\ inside',
    'escaped-looking \\n not a newline',
    'real\nnewline and\rcarriage',
    'trailing backslash \\',
    '\\\\ double backslash',
    'unicode: Ω≈ç √∫ 日本語 🚀',
    'angle <brackets> and {braces} | pipe ^ caret ` tick',
    'percent % plus + hash # dot .',
    '" .',         # looks like a line terminator
    '',            # empty string is a valid literal/IRI local name
]


def _triples_df(spark):
    rows = []
    for i, s in enumerate(NASTY):
        # alternate entity objects (IRI path) and value objects (literal
        # path) so both serializations chew on every nasty string
        rows.append((s, f"pred {i}", s, "THING" if i % 2 == 0 else None))
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_ne string")


def test_roundtrip_exact_over_hostile_strings(spark):
    from morra_spark.sources.rdf import from_ntriples, to_ntriples

    t = _triples_df(spark)
    lines = to_ntriples(t).withColumnRenamed("line", "value")
    back = from_ntriples(lines)
    want = {(r.subj, r.pred, r.obj, r.obj_ne is not None)
            for r in t.collect()}
    got = {(r.subj, r.pred, r.obj, r.obj_is_iri) for r in back.collect()}
    assert got == want


def test_serialization_is_spec_pinned(spark):
    """Exact emitted bytes for one hand-computed triple: IRI percent
    escapes + the four mandatory literal escapes, space-period-EOL."""
    from morra_spark.sources.rdf import to_ntriples

    t = spark.createDataFrame(
        [('a b', 'says', 'x "y\\z"\nw', None)],
        "subj string, pred string, obj string, obj_ne string")
    [row] = to_ntriples(t).collect()
    assert row.line == ('<urn:kg:a%20b> <urn:kg:says> '
                        '"x \\"y\\\\z\\"\\nw" .')


def test_entity_objects_become_iris_values_become_literals(spark):
    from morra_spark.sources.rdf import to_ntriples

    t = spark.createDataFrame(
        [("s", "p", "ent", "ORG"), ("s", "p", "val", None)],
        "subj string, pred string, obj string, obj_ne string")
    lines = sorted(r.line for r in to_ntriples(t).collect())
    assert lines == ['<urn:kg:s> <urn:kg:p> "val" .',
                     '<urn:kg:s> <urn:kg:p> <urn:kg:ent> .']
    # no obj_ne column -> everything is a literal
    all_lit = to_ntriples(t.drop("obj_ne")).collect()
    assert all('"' in r.line for r in all_lit)


def test_null_endpoints_are_dropped(spark):
    from morra_spark.sources.rdf import to_ntriples

    t = spark.createDataFrame(
        [("s", "p", None, None), (None, "p", "o", None),
         ("s", None, "o", None), ("s", "p", "o", None)],
        "subj string, pred string, obj string, obj_ne string")
    assert to_ntriples(t).count() == 1


def test_comments_blanks_skipped_and_strict_raises(spark):
    from morra_spark.sources.rdf import from_ntriples

    lines = spark.createDataFrame(
        [("# a comment",), ("",), ("   ",),
         ('<urn:kg:s> <urn:kg:p> "o" .',),
         ("_:blank <urn:kg:p> <urn:kg:o> .",)],  # blank node: unsupported
        "value string")
    with pytest.raises(ValueError, match="1 unparseable"):
        from_ntriples(lines).collect()
    got = from_ntriples(lines, strict=False).collect()
    assert [(r.subj, r.pred, r.obj, r.obj_is_iri) for r in got] == \
        [("s", "p", "o", False)]


def test_foreign_base_iris_pass_through_whole(spark):
    from morra_spark.sources.rdf import from_ntriples

    lines = spark.createDataFrame(
        [("<http://example.org/s> <urn:kg:p> <urn:kg:o%20x> .",)],
        "value string")
    [r] = from_ntriples(lines).collect()
    assert (r.subj, r.pred, r.obj) == ("http://example.org/s", "p", "o x")


def test_file_roundtrip(spark, tmp_path):
    from morra_spark.sources.rdf import read_ntriples, write_ntriples

    t = _triples_df(spark)
    path = str(tmp_path / "dump.nt")
    write_ntriples(t, path)
    back = read_ntriples(spark, path)
    assert ({(r.subj, r.pred, r.obj) for r in back.collect()}
            == {(r.subj, r.pred, r.obj) for r in t.collect()})
    # the dump is line-oriented plain text (the split-parallel property)
    raw = spark.read.text(path)
    assert raw.count() == len(NASTY)
    assert raw.filter(~F.col("value").endswith(" .")).count() == 0


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=6, unique=True))
def test_roundtrip_property_arbitrary_text(spark, texts):
    """Any unicode surface form survives subj (IRI), pred (IRI), and
    obj (literal AND IRI) round-trips exactly."""
    from morra_spark.sources.rdf import from_ntriples, to_ntriples

    rows = [(s, s, s, "T" if i % 2 else None)
            for i, s in enumerate(texts)]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_ne string")
    lines = to_ntriples(t).withColumnRenamed("line", "value")
    got = {(r.subj, r.pred, r.obj) for r in from_ntriples(lines).collect()}
    assert got == {(s, s, s) for s in texts}
