"""TableIO seam: parquet path today, clear failure for catalog tables
without an Iceberg runtime."""

from __future__ import annotations

import pytest

from morra_spark.sources.tableio import (iceberg_available, read_table,
                                         write_partitioned)


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "id % 4 as part")
    out = str(tmp_path / "t")
    write_partitioned(df, out, "part", mode="overwrite")
    back = read_table(spark, out)
    assert back.count() == 100
    assert set(back.columns) == {"id", "part"}


def test_catalog_table_fails_fast_without_iceberg(spark):
    assert not iceberg_available(spark)
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        read_table(spark, "cat.db.transcripts")
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        write_partitioned(spark.range(1), "cat.db.t", "id")


def test_merge_upsert_parquet_emulation(spark, tmp_path):
    """Keyed upsert semantics through the seam (parquet emulation):
    insert, update-in-place by key, idempotent re-apply — the same
    contract the Iceberg MERGE INTO path provides atomically."""
    from morra_spark.sources.tableio import merge_upsert

    t = str(tmp_path / "upsert")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    merge_upsert(base, t, ["k"])  # first write: plain insert
    assert {(r.k, r.v) for r in spark.read.parquet(t).collect()} \
        == {(1, "a"), (2, "b"), (3, "c")}

    delta = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "k long, v string")
    merge_upsert(delta, t, ["k"])  # update k=2, insert k=4
    got = {(r.k, r.v) for r in spark.read.parquet(t).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}

    merge_upsert(delta, t, ["k"])  # idempotent re-apply (batch retry)
    got2 = {(r.k, r.v) for r in spark.read.parquet(t).collect()}
    assert got2 == got

    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        merge_upsert(delta, "cat.db.triples", ["k"])


def test_merge_upsert_existing_table_read_failure_propagates(spark, tmp_path):
    """ADVICE r3 medium: a read failure of an EXISTING target must NOT be
    treated as 'first write' — that path rmtree'd the target and replaced
    it with only the new rows, silently losing all prior data. A corrupt
    existing table now raises; the target directory is left untouched."""
    import os

    from morra_spark.sources.tableio import merge_upsert

    t = str(tmp_path / "corrupt")
    os.makedirs(t)
    with open(f"{t}/part-00000.parquet", "wb") as f:
        f.write(b"not a parquet footer")
    delta = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(Exception):
        merge_upsert(delta, t, ["k"])
    # prior (corrupt-but-existing) data was not clobbered by the upsert
    assert os.path.exists(f"{t}/part-00000.parquet")
