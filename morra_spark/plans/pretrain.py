"""Pretraining data layout runner — the end-to-end composition a
training-data pipeline actually ships (SURVEY.md §2, LLM-data-pipeline
block composed):

    curate (quality gates + dedup cascade)     plans/curate.py
      → deterministic train/val/test split     operators/curation.split_assign
        → context-window sequence packing      operators/curation.pack_sequences
          → per-split packed chunk tables + accounting

    python -m morra_spark.plans.pretrain --docs <parquet> --out <dir>

Output layout::

    {out}/packed/split=train|val|test/   (doc_id, source, n_tok,
                                          start_off, end_off, chunk_id,
                                          straddles)
    {out}/accounting/                    (split, n_docs, n_tokens,
                                          n_chunks) one row per split

Design constraints carried through the whole chain:

* Every stage's decision is DETERMINISTIC on the row's own identity
  (portable-hash split, offset-based packing) — re-running any stage on
  any partitioning reproduces the same layout, so a resumed or
  partially re-run job cannot leak val/test docs into train.
* The split happens BEFORE packing, so no packed chunk ever straddles
  a split boundary — the invariant that makes the holdout honest
  (a train chunk sharing a context window with a test doc is a leak).
* Accounting is derived from the SAME frames that were written (one
  localCheckpoint each), so the report cannot drift from the data.
"""
from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_pretrain_layout(spark: SparkSession, *, docs_path: str,
                          out_dir: str, ctx_len: int = 512,
                          entropy_min: float | None = None,
                          adaptive_length: bool = False) -> dict:
    """Run the full curate → split → pack chain; returns the accounting
    rows as a dict keyed by split."""
    from morra_spark.operators.curation import pack_sequences, split_assign
    from morra_spark.plans.curate import label_documents

    docs = spark.read.parquet(docs_path)
    # checkpoint the LABELED frame, not the joined one: both join
    # branches below (survivors and splits) derive from it, so without
    # this cut the whole curation cascade runs once per branch in a
    # single job — run_curation checkpoints at the same spot for the
    # same reason (code-review r5)
    labeled = label_documents(docs, entropy_min=entropy_min,
                              adaptive_length=adaptive_length) \
        .localCheckpoint(eager=False)
    survivors = labeled.filter(F.col("stage") == "kept").drop("stage")

    # lang is optional here: the hash split needs only doc_id, lang
    # just rides along — a docs table without the column gets 'und'
    # instead of an UNRESOLVED_COLUMN crash (code-review r5; curate.py
    # guards its lang-dependent path the same way)
    lang_col = (F.coalesce(F.col("lang"), F.lit("und"))
                if "lang" in docs.columns else F.lit("und"))
    splits = split_assign(survivors.select(
        "doc_id", lang_col.alias("lang"))) \
        .select("doc_id", "split")
    tagged = survivors.join(splits, "doc_id")

    packed_parts = []
    for split in ("train", "val", "test"):
        part = tagged.filter(F.col("split") == split)
        packed = pack_sequences(
            part.select("doc_id", "text", "source"), ctx_len=ctx_len) \
            .withColumn("split", F.lit(split))
        packed_parts.append(packed)
    packed_all = packed_parts[0]
    for p in packed_parts[1:]:
        packed_all = packed_all.unionByName(p)
    packed_all = packed_all.localCheckpoint(eager=False)
    (packed_all.write.mode("overwrite").partitionBy("split")
     .parquet(f"{out_dir}/packed"))

    # chunks per stream = ceil(stream token total / ctx_len) — counting
    # distinct doc-start chunk_ids would undercount whenever one doc
    # spans several context windows (its middle windows hold no start)
    per_stream = (packed_all.groupBy("split", "source")
                  .agg(F.ceil(F.max("end_off") / F.lit(ctx_len))
                       .cast("long").alias("chunks")))
    acct = (packed_all.groupBy("split")
            .agg(F.countDistinct("doc_id").alias("n_docs"),
                 F.sum("n_tok").cast("long").alias("n_tokens"))
            .join(per_stream.groupBy("split")
                  .agg(F.sum("chunks").cast("long").alias("n_chunks")),
                  "split")
            .orderBy("split"))
    acct.write.mode("overwrite").parquet(f"{out_dir}/accounting")
    return {r["split"]: (r["n_docs"], r["n_tokens"], r["n_chunks"])
            for r in acct.collect()}


def main() -> None:
    from morra_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ctx-len", type=int, default=512)
    ap.add_argument("--entropy-min", type=float, default=None)
    ap.add_argument("--adaptive-length", action="store_true")
    args = ap.parse_args()
    spark = get_spark("pretrain_layout")
    rep = build_pretrain_layout(spark, docs_path=args.docs,
                                out_dir=args.out, ctx_len=args.ctx_len,
                                entropy_min=args.entropy_min,
                                adaptive_length=args.adaptive_length)
    for split, (nd, nt, nc) in sorted(rep.items()):
        print(f"{split:>6}: {nd} docs, {nt} tokens, {nc} chunks")


if __name__ == "__main__":
    main()
