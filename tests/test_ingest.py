"""Tolerant ingestion (sources/ingest.py): schema-contract conformance
over drifted parquet files and JSONL corrupt-record quarantine."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def spark():
    from morra_spark.session import get_spark
    return get_spark("test_ingest")


CONTRACT = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def test_read_with_contract_conforms_drifted_files(spark, tmp_path):
    from morra_spark.sources.ingest import read_with_contract

    d = str(tmp_path / "drift")
    # v1: no `score`, extra `junk`; v2: score as INT (narrower);
    # v3: score as DOUBLE (the contract type) — mergeSchema would
    # throw CANNOT_MERGE_SCHEMAS on the v2/v3 mix, the contract read
    # must absorb it
    spark.createDataFrame([(1, "a", "en", "x")],
                          "doc_id long, text string, lang string,"
                          " junk string") \
        .write.parquet(d)
    spark.createDataFrame([(2, "b", "de", 7)],
                          "doc_id long, text string, lang string,"
                          " score int") \
        .write.mode("append").parquet(d)
    spark.createDataFrame([(3, "c", "fr", 2.5)],
                          "doc_id long, text string, lang string,"
                          " score double") \
        .write.mode("append").parquet(d)
    out = read_with_contract(spark, d, CONTRACT)
    assert out.columns == ["doc_id", "text", "lang", "score"]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].score is None           # missing -> typed NULL
    assert rows[2].score == 7.0            # int widened to double
    assert isinstance(rows[2].score, float)
    assert rows[3].score == 2.5


def test_read_jsonl_quarantines_broken_lines(spark, tmp_path):
    from morra_spark.sources.ingest import read_jsonl

    p = tmp_path / "feed.jsonl"
    p.write_text('\n'.join([
        '{"doc_id": 1, "text": "ok one"}',
        '{"doc_id": 2, "text": "ok two"}',
        '{"doc_id": 3, "text": "truncated',          # broken JSON
        'not json at all',                           # garbage
        '{"doc_id": 4, "text": "ok three"}',
    ]))
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    good, bad = read_jsonl(spark, str(p), schema)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 4]
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2
    assert any("truncated" in r for r in raws)
    assert any("not json" in r for r in raws)
