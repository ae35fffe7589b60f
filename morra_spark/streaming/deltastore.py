"""Generic delta-then-compact store — the shared machinery behind the
streaming KG maintainers (``streaming/graph.py`` edge rollup,
``streaming/history.py`` SCD2 assertion log).

The pattern (see graph.py's module docstring for the full rationale):
micro-batches write self-contained delta directories keyed by the
Structured Streaming ``batch_id`` (mode=overwrite → a retried batch
replaces its own output, exactly-once without a merge ledger); readers
fold base ⊎ pending deltas with a caller-supplied ALGEBRAIC fold; a
maintenance job compacts deltas into the base behind a manifest that
makes the crash window between base-swap and delta-delete harmless.

The fold callback is the store's correctness contract: it must be
idempotent-mergeable over row multisets (SUM/MIN/MAX group-bys,
DISTINCT). Anything non-mergeable (exact distinct counts, global
argmax) must stay on a batch path — claiming it here would be silently
wrong under re-folding.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_folded_batches.json"


def fs_handles(spark: SparkSession, path: str):
    """(jvm, hadoop FileSystem) for ``path`` — FS-agnostic existence /
    IO (the ADVICE-r4 discipline: never os.path on a maybe-remote URI)."""
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jp.getFileSystem(spark._jsc.hadoopConfiguration())


def read_manifest(spark: SparkSession, base_dir: str) -> set[int]:
    """Batch ids the current base already contains (empty when the base
    is absent or predates the manifest scheme)."""
    jvm, fs = fs_handles(spark, base_dir)
    p = jvm.org.apache.hadoop.fs.Path(f"{base_dir}/{MANIFEST}")
    if not fs.exists(p):
        return set()
    stream = fs.open(p)
    out = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 4096, True)
    return set(json.loads(bytes(out.toByteArray()).decode("utf-8")))


def list_delta_batches(spark: SparkSession, delta_root: str) -> list[int]:
    """Snapshot-list the COMMITTED delta batch directories present
    RIGHT NOW — compaction folds and deletes exactly this set, so a
    batch a live stream writes after the listing is never touched.

    Committed = the directory carries the ``_SUCCESS`` marker Spark's
    file committer writes on job commit. A directory without it is
    either mid-write by the live stream or the debris of a crashed
    write (which the streaming retry will overwrite under the same
    batch_id) — folding it would bake a HALF-written batch into the
    base and then delete the rest of its rows forever (code-review r5);
    skipping it simply defers the batch to the next listing."""
    jvm, fs = fs_handles(spark, delta_root)
    root = jvm.org.apache.hadoop.fs.Path(delta_root)
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            marker = jvm.org.apache.hadoop.fs.Path(
                f"{delta_root}/{name}/_SUCCESS")
            if fs.exists(marker):
                ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def pending_deltas(spark: SparkSession, delta_root: str,
                   batch_ids: list[int], folded: set[int]):
    """Delta rows for the listed batches MINUS the already-folded ones
    (explicit per-directory paths, not a root scan — a concurrently
    writing batch is never listed and the scan is pruned to exactly the
    pending partitions). (None, []) when nothing pends."""
    pending = [b for b in batch_ids if b not in folded]
    if not pending:
        return None, []
    paths = [f"{delta_root}/batch_id={b}" for b in pending]
    return (spark.read.option("basePath", delta_root).parquet(*paths),
            pending)


def read_store(spark: SparkSession, base_dir: str, delta_root: str,
               columns: list[str],
               fold: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Current table = compacted base ⊎ pending deltas, folded once.
    Either side may be absent (fresh stream / just compacted); raises
    FileNotFoundError when both are. Deltas the base manifest already
    claims are excluded — in the crash window between a compaction's
    base swap and its delta delete, folding them again would be wrong
    for any non-idempotent fold (and wasted work for an idempotent one).
    """
    from morra_spark.sources.tableio import read_existing_parquet

    parts = []
    base = read_existing_parquet(spark, base_dir)
    if base is not None:
        parts.append(base.select(*columns))
    deltas, _ = pending_deltas(spark, delta_root,
                               list_delta_batches(spark, delta_root),
                               read_manifest(spark, base_dir))
    if deltas is not None:
        parts.append(deltas.select(*columns))
    if not parts:
        raise FileNotFoundError(
            f"no base ({base_dir}) or deltas ({delta_root})")
    if deltas is None and base is not None:
        # nothing pending: the base is fold(merged) by construction
        # (compact wrote it) — re-folding would re-shuffle the whole
        # table on every read for zero benefit (code-review r5)
        return parts[0]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return fold(out)


def compact(spark: SparkSession, base_dir: str, delta_root: str,
            columns: list[str],
            fold: Callable[[DataFrame], DataFrame]) -> int:
    """Fold pending deltas into the base and delete exactly those delta
    directories; returns the number folded. Safe against a concurrent
    stream (only the snapshot-listed batches are touched) and a crash
    at ANY point: the swapped base's manifest names every folded batch,
    so a re-run sees them as already-folded and only cleans up."""
    from morra_spark.sources.tableio import fs_swap, read_existing_parquet

    batch_ids = list_delta_batches(spark, delta_root)
    folded_before = read_manifest(spark, base_dir)
    jvm, fs = fs_handles(spark, base_dir)

    deltas, pending = pending_deltas(spark, delta_root, batch_ids,
                                     folded_before)
    if deltas is not None:
        base = read_existing_parquet(spark, base_dir)
        merged = deltas.select(*columns)
        if base is not None:
            merged = base.select(*columns).unionByName(merged)
        tmp = f"{base_dir}__compact_tmp"
        fold(merged).write.mode("overwrite").parquet(tmp)
        # manifest rides INSIDE the new base dir (written before the
        # swap → base-with-manifest appears atomically to any re-run);
        # keep only ids that could still have a directory on disk
        keep = sorted((folded_before & set(batch_ids)) | set(pending))
        out = fs.create(jvm.org.apache.hadoop.fs.Path(f"{tmp}/{MANIFEST}"),
                        True)
        out.write(bytearray(json.dumps(keep).encode("utf-8")))
        out.close()
        fs_swap(spark, tmp, base_dir)

    # cleanup: the just-folded dirs plus leftovers of a crashed prior run
    for b in sorted(set(pending) | (folded_before & set(batch_ids))):
        p = jvm.org.apache.hadoop.fs.Path(f"{delta_root}/batch_id={b}")
        if fs.exists(p) and not fs.delete(p, True):
            raise IOError(f"compact: could not delete folded delta {p} — "
                          f"reads stay correct (manifest excludes it) but "
                          f"the directory needs manual cleanup")
    return len(pending)
