"""Table I/O abstraction: plain Parquet locally, Iceberg on a cluster.

The production spec (BASELINE.json input_hint) is an Iceberg table of
transcripts; this sandbox has no Iceberg runtime jar (SURVEY.md §1.2
``[E]``), so every reader/writer goes through this seam: parquet paths
today, ``catalog.db.table`` identifiers when the session was started with
``--packages org.apache.iceberg:iceberg-spark-runtime-…`` and a catalog
conf. The downstream plan is IDENTICAL either way — Iceberg changes the
scan/commit layer, not the operators.

Detection: a target containing ``/`` (or ``file:``/``s3:`` scheme) is a
path → parquet; otherwise it is a table identifier → ``spark.read.table``
/ ``writeTo`` (requires the catalog at runtime). ``iceberg_available``
reports whether the session actually has an Iceberg catalog configured,
so callers can fail fast with a clear message instead of a class-not-
found deep in the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _is_path(target: str) -> bool:
    return "/" in target or target.startswith(("file:", "s3:", "s3a:", "hdfs:"))


def iceberg_available(spark: SparkSession) -> bool:
    conf = spark.sparkContext.getConf()
    return any(k.startswith("spark.sql.catalog.") for k, _ in conf.getAll())


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """B-S1: transcripts (or any) table from a parquet dir or catalog id."""
    if _is_path(target):
        return spark.read.parquet(target)
    if not iceberg_available(spark):
        raise RuntimeError(
            f"'{target}' looks like a catalog table but no Iceberg catalog is "
            "configured; start the session with --packages org.apache.iceberg:"
            "iceberg-spark-runtime-… and spark.sql.catalog.* conf, or pass a "
            "parquet path")
    return spark.read.table(target)


def write_partitioned(df: DataFrame, target: str, partition_col: str,
                      mode: str = "append") -> None:
    """B-S2: partitioned sink. Parquet ``partitionBy`` locally; Iceberg
    ``writeTo(...).append()`` against a catalog table (the table's own
    partition spec governs layout there)."""
    if _is_path(target):
        df.write.mode(mode).partitionBy(partition_col).parquet(target)
        return
    if not iceberg_available(df.sparkSession):
        raise RuntimeError(f"no Iceberg catalog for table '{target}'")
    w = df.writeTo(target)
    if mode == "append":
        w.append()
    elif mode == "overwrite":
        w.createOrReplace()
    else:
        raise ValueError(f"unsupported mode {mode!r} for Iceberg writeTo")
