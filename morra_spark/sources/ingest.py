"""Tolerant ingestion sources — schema-contract reads and JSONL with
corrupt-record quarantine (SURVEY.md §2 B-S row extensions: the messy
edges of a real 100 TB feed, where files drift and lines break).

Two failure modes a recurring crawl ingest MUST absorb without a 3 a.m.
page:

* **Schema drift** — yesterday's files lack a column today's carry, or
  carry it narrower (int where the contract says double).
  ``read_with_contract`` reads WITH the contract as the explicit read
  schema: the parquet reader materializes missing columns as typed
  NULLs, widens compatible types per file (int→long/double,
  float→double — verified against mixed-generation dirs), and never
  touches columns the contract doesn't declare. This deliberately
  avoids ``mergeSchema``, which THROWS ``CANNOT_MERGE_SCHEMAS`` on
  exactly the type drift this function exists to absorb. Genuinely
  incompatible drift (string where the contract says numeric) still
  fails loudly at read — that is a producer bug, not drift.
* **Broken records** — a truncated JSON line must not kill a
  billion-line job, and must not vanish either. ``read_jsonl`` parses
  via ``from_json`` over a plain text read and returns (good, bad):
  the quarantine frame carries the raw line for replay/debugging, and
  accounting on it is the data-quality signal. No caching is needed
  (unlike the ``_corrupt_record`` idiom, which requires caching the
  parsed frame to filter on the corrupt column and would pin every
  feed's blocks in executor storage for the application lifetime).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_with_contract(spark: SparkSession, path: str,
                       contract: T.StructType) -> DataFrame:
    """Read a parquet dir conformed to ``contract``: missing columns
    become typed NULLs, narrower-but-compatible file types widen to the
    contract type, undeclared columns are dropped, column order is the
    contract's. One scan, no schema merge pass over footers."""
    return spark.read.schema(contract).parquet(path) \
        .select(*[f.name for f in contract.fields])


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> tuple[DataFrame, DataFrame]:
    """JSONL source with quarantine: returns ``(good, bad)``.

    ``good`` carries the declared columns for lines that parse as JSON
    objects; ``bad`` carries ``(raw,)`` — the original line of every
    record that failed — for replay once the producer is fixed. Both
    frames derive lazily from one text scan. Field semantics
    (code-review r5 — verified, the docstring previously over-promised):
    a MISSING field surfaces as a typed NULL in ``good``, but a
    MISTYPED field (e.g. a stringified number where the schema says
    int) trips ``from_json``'s corrupt-record marker and quarantines
    the WHOLE line to ``bad`` — per-field permissiveness does not
    extend to type mismatches, so alert on bad-ratio covers schema
    drift as well as broken JSON.
    """
    with_corrupt = T.StructType(
        list(schema.fields)
        + [T.StructField("_corrupt", T.StringType())])
    raw = spark.read.text(path).filter(F.trim(F.col("value")) != "")
    # from_json in PERMISSIVE mode yields an ALL-NULL struct (not a
    # NULL) for a broken line, so corrupt detection must ride inside
    # the struct via columnNameOfCorruptRecord — filtering j IS NULL
    # would classify nothing as bad
    parsed = raw.withColumn("j", F.from_json(
        F.col("value"), with_corrupt,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}))
    bad = parsed.filter(F.col("j._corrupt").isNotNull()) \
        .select(F.col("value").alias("raw"))
    good = (parsed.filter(F.col("j._corrupt").isNull())
            .select(*[F.col(f"j.{f.name}") for f in schema.fields]))
    return good, bad
