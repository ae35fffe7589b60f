"""Tolerant ingestion sources — schema-contract reads and JSONL with
corrupt-record quarantine (SURVEY.md §2 B-S row extensions: the messy
edges of a real 100 TB feed, where files drift and lines break).

Two failure modes a recurring crawl ingest MUST absorb without a 3 a.m.
page:

* **Schema drift** — yesterday's files lack a column today's carry (or
  widened a type). ``read_with_contract`` reads with ``mergeSchema``,
  then conforms to the DECLARED contract: missing columns materialize
  as typed NULLs, compatible types are cast, and columns the contract
  doesn't know are dropped (they can be re-derived from the files
  later; silently propagating them breaks downstream schema checks).
* **Broken records** — a truncated JSON line must not kill a
  billion-line job, and must not vanish either. ``read_jsonl`` uses
  Spark's PERMISSIVE corrupt-record channel and returns (good, bad):
  the quarantine frame carries the raw line for replay/debugging, and
  accounting on it is the data-quality signal.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_with_contract(spark: SparkSession, path: str,
                       contract: T.StructType) -> DataFrame:
    """Read a parquet dir and conform it to ``contract``: merge file
    schemas, add missing columns as typed NULLs, cast drifted-but-
    compatible columns, drop extras, and order columns per contract.
    Raises on an incompatible cast only when Spark itself cannot plan
    it (e.g. string→struct)."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in contract.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """JSONL source with quarantine: returns ``(good, bad)``.

    ``good`` carries the declared columns for parseable lines; ``bad``
    carries ``(raw,)`` — the original line of every record that failed
    to parse or missed the schema — for replay once the producer is
    fixed. PERMISSIVE mode keeps the job alive; the quarantine keeps
    the evidence.
    """
    with_corrupt = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt_record", T.StringType())])
    df = (spark.read.schema(with_corrupt)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(path)).cache()
    bad = (df.filter(F.col("_corrupt_record").isNotNull())
           .select(F.col("_corrupt_record").alias("raw")))
    good = (df.filter(F.col("_corrupt_record").isNull())
            .drop("_corrupt_record"))
    return good, bad
