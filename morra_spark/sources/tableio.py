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


def merge_upsert(df: DataFrame, target: str, keys: list[str]) -> None:
    """B-T4's strongest form: keyed upsert (update-or-insert by ``keys``).

    Iceberg path — a real ``MERGE INTO``: atomic snapshot commit,
    exactly-once under concurrent readers, no table rewrite; this is the
    production form for streaming ``foreachBatch`` triple upserts.

    Parquet path — documented EMULATION for the jar-less sandbox:
    read current table, anti-join rows being replaced, union the new
    rows, write to a sibling temp dir, swap. Correct for a single
    writer and crash-safe up to the final directory swap (the swap is
    two FS metadata ops, not atomic like an Iceberg commit — exactly
    the gap Iceberg closes, which is why production uses the catalog
    path). Semantics are identical either way, so tests written against
    this seam transfer to the cluster unchanged.
    """
    spark = df.sparkSession
    if _is_path(target):
        import os
        import shutil

        # 'first write' means the target genuinely does not exist —
        # a transient read failure of an EXISTING table must propagate,
        # or the swap below silently drops all prior rows (ADVICE r3)
        if os.path.exists(target):
            cur = spark.read.parquet(target)
            out = cur.join(df.select(*keys).distinct(), keys, "left_anti") \
                .unionByName(df)
        else:
            out = df
        tmp = target.rstrip("/") + "__upsert_tmp"
        out.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.rename(tmp, target)
        return
    if not iceberg_available(spark):
        raise RuntimeError(f"no Iceberg catalog for table '{target}'")
    df.createOrReplaceTempView("_merge_upsert_src")
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    spark.sql(f"MERGE INTO {target} t USING _merge_upsert_src s ON {cond} "
              "WHEN MATCHED THEN UPDATE SET * "
              "WHEN NOT MATCHED THEN INSERT *")
