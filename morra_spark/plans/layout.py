"""Sorted corpus layout — range-partitioned global-order parquet writes
(SURVEY.md §2 B-O1 materialized as a SINK property, not just a query).

Why a layout pass exists at 100 TB: a corpus written in ingestion order
answers "give me the top quality tier" or "stream docs curriculum-style
from easy to hard" only by scanning everything. Writing it ONCE in
global sort order makes every later range predicate on the sort key a
file-skipping operation — parquet footers carry per-column min/max, so
a reader of ``quality_tier BETWEEN 1 AND 2`` opens only the files whose
range overlaps, and a curriculum trainer reads files in name order and
gets globally ordered data without any runtime sort.

``write_sorted`` plans exactly one range exchange (sampling the sort
key to build balanced range bounds — Spark's RangePartitioner) followed
by a per-partition local sort; there is no global merge step, because
file N's key range precedes file N+1's by construction. That is the
cheapest possible global sort: the same two steps any engine must do,
with the merge replaced by naming.

Skew note: range bounds come from reservoir sampling, so a heavily
repeated sort-key value (every doc scoring exactly 0.0) can overfill
one range. Passing ``salt_within_ties=True`` appends a portable hash of
the row id as a final sort column — same global order on the real key,
ties spread across their range instead of one writer task.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_sorted(df: DataFrame, path: str, sort_cols: list[str],
                 n_files: int, id_col: str = "doc_id",
                 salt_within_ties: bool = True) -> None:
    """Write ``df`` as ``n_files`` parquet files globally ordered by
    ``sort_cols`` (file k's key range entirely precedes file k+1's)."""
    cols: list[Column] = [F.col(c) for c in sort_cols]
    if salt_within_ties:
        cols = cols + [F.xxhash64(F.col(id_col))]
    (df.repartitionByRange(n_files, *cols)
       .sortWithinPartitions(*cols)
       .write.mode("overwrite").parquet(path))


def file_key_ranges(spark, path: str, key: str) -> list[tuple]:
    """(file, min(key), max(key)) per parquet file via footer stats —
    the metadata a range-pruning reader uses; test hook for asserting
    the global-order contract without reading data pages."""
    import pyarrow.parquet as pq
    import os

    out = []
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                if col.path_in_schema == key and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            out.append((fn, lo, hi))
    return out


def zorder_key(col_a: Column, col_b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) key: bit-interleave two ``bits``-wide bucketized
    ints into one sort key, so ONE ``write_sorted`` pass gives file
    min/max locality on BOTH columns — the classic multi-dimensional
    layout trick (Delta/Iceberg OPTIMIZE ZORDER does exactly this):
    a reader filtering on either column (or a 2-D range) skips most
    files, where a plain sort on column A leaves column B scattered
    through every file.

    Pure JVM bit arithmetic (one expression, no UDF): inputs are
    clamped into [0, 2^bits); bit i of A lands at position 2i+1, bit i
    of B at 2i. Interleaving is order-preserving per dimension at every
    shared prefix, which is all range pruning needs.
    """
    cap = (1 << bits) - 1
    a = F.least(F.greatest(col_a.cast("long"), F.lit(0)), F.lit(cap))
    b = F.least(F.greatest(col_b.cast("long"), F.lit(0)), F.lit(cap))
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftrightunsigned(a, i).bitwiseAND(1)
        bbit = F.shiftrightunsigned(b, i).bitwiseAND(1)
        key = key + (abit * F.lit(1 << (2 * i + 1))) \
            + (bbit * F.lit(1 << (2 * i)))
    return key


def compact_partitions(spark, path: str, target_mb: int = 128,
                       partition_col: str | None = None) -> dict:
    """Small-file compaction: rewrite a parquet dir (optionally
    partitioned by ``partition_col``) into files sized near
    ``target_mb``. The operational pass every long-lived table needs —
    streaming sinks and incremental jobs each land many small files,
    and a 100 TB table read at 10k files/GB spends more time in footer
    fetches and task scheduling than in data.

    Sizing: bytes-per-row is measured from the ACTUAL on-disk size
    (self-tuning across schema/compression changes) and enforced via
    ``maxRecordsPerFile`` — so in the partitioned branch each partition
    directory gets files proportional to ITS data (a 10 GB hot
    partition splits into ~target_mb files, a 10 MB one stays a single
    file) with no per-partition bookkeeping.

    Output goes to a fresh ``path + "_compacted"`` sibling: the source
    dir is never modified, so a crash mid-compaction leaves the
    original fully intact and a retry simply rebuilds the sibling;
    the caller swaps it in (rename) once complete. This is the honest
    crash-safety story for a filesystem table — in-place per-partition
    replacement belongs to a table format with atomic commits
    (Iceberg ``rewrite_data_files`` via the ``sources/tableio`` seam).
    Returns {files_before, files_after, bytes, out_path}.
    """
    import math
    import os

    def dir_stats(p):
        files = 0
        size = 0
        for root, _d, fs in os.walk(p):
            for fn in fs:
                if fn.endswith(".parquet"):
                    files += 1
                    size += os.path.getsize(os.path.join(root, fn))
        return files, size

    before, total = dir_stats(path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    bytes_per_row = max(1.0, total / max(1, n_rows))
    max_records = max(1, int((target_mb << 20) / bytes_per_row))
    out_path = path + "_compacted"
    if partition_col is None:
        n = max(1, math.ceil(total / (target_mb << 20)))
        (df.repartition(n).write.mode("overwrite")
           .option("maxRecordsPerFile", max_records)
           .parquet(out_path))
    else:
        (df.repartition(F.col(partition_col))
           .write.mode("overwrite")
           .option("maxRecordsPerFile", max_records)
           .partitionBy(partition_col).parquet(out_path))
    after, _ = dir_stats(out_path)
    return {"files_before": before, "files_after": after,
            "bytes": total, "out_path": out_path}
