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
