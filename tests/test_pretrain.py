"""Pretraining layout runner (plans/pretrain.py): curate → split → pack
composition invariants — split leakage impossible, packing contiguous
per stream, accounting reconciles with the written data."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from morra_spark.session import get_spark
    return get_spark("test_pretrain")


@pytest.fixture(scope="module")
def docs_src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pre") / "docs")

    def good(i: int) -> str:
        return (f"the v{i}a v{i}b of and a v{i}c v{i}d v{i}e v{i}f"
                f" v{i}g v{i}h tail{i}")

    rows = [(i, good(i), "en" if i % 2 else "de", f"s{i % 3}", 60)
            for i in range(40)]
    rows.append((90, "too short", "en", "s0", 9))  # quality-dropped
    schema = ("doc_id long, text string, lang string, source string,"
              " n_chars long")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(d)
    return d


def test_pretrain_layout_invariants(spark, docs_src, tmp_path):
    from morra_spark.operators.curation import split_assign
    from morra_spark.plans.pretrain import build_pretrain_layout

    out = str(tmp_path / "out")
    rep = build_pretrain_layout(spark, docs_path=docs_src, out_dir=out,
                                ctx_len=16)
    packed = spark.read.parquet(f"{out}/packed")

    # quality-dropped doc never reaches any split
    assert packed.filter(F.col("doc_id") == 90).count() == 0
    # splits partition the survivors: each doc in exactly one split
    per_doc = packed.groupBy("doc_id") \
        .agg(F.countDistinct("split").alias("ns")).collect()
    assert all(r.ns == 1 for r in per_doc)
    # the split matches the standalone deterministic operator
    docs = spark.read.parquet(docs_src).filter(F.col("doc_id") != 90)
    expect = {r.doc_id: r.split for r in
              split_assign(docs.select("doc_id", "lang")).collect()}
    got = {r.doc_id: r.split
           for r in packed.select("doc_id", "split").collect()}
    assert got == expect

    # packing contiguous per (split, source): offsets tile [0, total)
    for (split, source), rows in _group(packed.collect()):
        rows = sorted(rows, key=lambda r: r.start_off)
        assert rows[0].start_off == 0
        for a, b in zip(rows, rows[1:]):
            assert a.end_off == b.start_off
    # accounting reconciles with the written frame; n_chunks counts
    # COVERED context windows (ceil of each stream's token total / 16),
    # not just chunks some doc starts in
    import math
    for split, (nd, nt, nc) in rep.items():
        part = packed.filter(F.col("split") == split)
        assert part.select("doc_id").distinct().count() == nd
        assert part.agg(F.sum("n_tok")).collect()[0][0] == nt
        stream_tot = part.groupBy("source") \
            .agg(F.max("end_off").alias("m")).collect()
        assert nc == sum(math.ceil(r.m / 16) for r in stream_tot)
    assert "train" in rep and set(rep) <= {"train", "val", "test"}


def _group(rows):
    from collections import defaultdict

    g = defaultdict(list)
    for r in rows:
        g[(r.split, r.source)].append(r)
    return g.items()
