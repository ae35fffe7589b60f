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


def fs_swap(spark: SparkSession, tmp: str, target: str) -> None:
    """Replace ``target`` with ``tmp`` through the Hadoop FileSystem API,
    CHECKING the boolean results.

    Hadoop's ``FileSystem.rename``/``delete`` report most failures by
    returning ``false`` rather than throwing (missing dst parent,
    cross-filesystem move, S3A partial-rename) — an unchecked swap that
    deleted the target and then failed to rename would silently destroy
    the table and let the caller treat the next run as a fresh write
    (code-review r5). Raises ``IOError`` and leaves ``tmp`` in place on
    any failed step, so the data is still recoverable by hand.
    """
    jvm = spark._jvm
    jtgt = jvm.org.apache.hadoop.fs.Path(target)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = jtgt.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jtgt) and not fs.delete(jtgt, True):
        raise IOError(f"fs_swap: could not delete existing {target}; "
                      f"new data left at {tmp}")
    if not fs.rename(jtmp, jtgt):
        raise IOError(f"fs_swap: rename {tmp} -> {target} returned false "
                      f"(target was removed; recover from {tmp})")


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API.

    Resolves the scheme (``file:``, ``hdfs:``, ``s3a:``, bare local
    path) exactly the way Spark's own readers do, so fresh-run
    detection behaves identically on a laptop and on an object store.
    ``os.path.exists`` is always False for remote URIs (ADVICE r4),
    which would misclassify every production resume as a fresh run —
    re-appending backfills and recomputing every checkpointed part.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def read_existing_parquet(spark: SparkSession, path: str):
    """``spark.read.parquet(path)`` if a usable table exists, else None.

    None means 'fresh run': the path is absent, or it exists but holds
    no readable parquet footer — e.g. only a ``_temporary/`` dir left
    by a crash during the very first write (ADVICE r4), which Spark
    surfaces as UNABLE_TO_INFER_SCHEMA. Any OTHER read failure of an
    existing table propagates: misreading one as 'fresh' is how prior
    output gets silently dropped (upsert swap) or duplicated (backfill
    re-append).
    """
    if not fs_exists(spark, path):
        return None
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        cls = ""
        get_cls = getattr(e, "getCondition", None) \
            or getattr(e, "getErrorClass", None)
        if callable(get_cls):
            cls = get_cls() or ""
        if "UNABLE_TO_INFER_SCHEMA" in cls or \
                "UNABLE_TO_INFER_SCHEMA" in str(e):
            return None
        raise


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
        # 'first write' means the target genuinely does not exist (or a
        # first-write crash left no readable footer) — probed through
        # the Hadoop FS API so s3a:/hdfs: targets resume correctly
        # (ADVICE r4); a transient read failure of an EXISTING table
        # still propagates, or the swap below silently drops prior rows
        cur = read_existing_parquet(spark, target)
        if cur is not None:
            out = cur.join(df.select(*keys).distinct(), keys, "left_anti") \
                .unionByName(df)
        else:
            out = df
        tmp = target.rstrip("/") + "__upsert_tmp"
        out.write.mode("overwrite").parquet(tmp)
        # swap through the same FileSystem the data was written with —
        # two metadata ops on any scheme, not local-only os.rename;
        # fs_swap checks the Hadoop boolean results so a failed rename
        # raises instead of silently dropping the table
        fs_swap(spark, tmp, target)
        return
    if not iceberg_available(spark):
        raise RuntimeError(f"no Iceberg catalog for table '{target}'")
    df.createOrReplaceTempView("_merge_upsert_src")
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    spark.sql(f"MERGE INTO {target} t USING _merge_upsert_src s ON {cond} "
              "WHEN MATCHED THEN UPDATE SET * "
              "WHEN NOT MATCHED THEN INSERT *")
