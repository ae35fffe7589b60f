"""Diagnose the 4-executor scaling anomaly: time flagship VARIANTS at a
given executor count (pinned local-cluster, same protocol as bench.py).

Variants:
  content  — content triples only (map + count, no union/window stage)
  tools    — full flagship (extract_triples_with_tools)
  tools2x  — full flagship with shuffle_partitions = 2 x cores

Usage: python scripts/scaling_diag.py --execs 4 [--variant tools] [--convs 400000]
Prints one JSON line per timed run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(spark, transcripts_path, variant):
    from pyspark.sql import functions as F

    import bench
    from morra_spark.model_artifact import KGModel
    from morra_spark.operators.tagger import extract_turn_triples
    from morra_spark.plans import checkpoint as CK
    from morra_spark.plans.pipeline import (entity_candidates_df,
                                            extract_triples_with_tools,
                                            load_transcripts)

    model = KGModel.load(bench.MODEL_PATH)
    bc = spark.sparkContext.broadcast(model)
    src = load_transcripts(spark, transcripts_path)
    t0 = time.time()
    content = src.filter(F.col("role") != "tool")
    ann = CK.add_part_key(extract_turn_triples(content, bc), 64)
    if variant == "content":
        n = ann.select(F.explode("triples")).count()
    else:
        triples = extract_triples_with_tools(
            ann, entity_candidates_df(spark, model), src, 64)
        n = triples.count()
    sec = time.time() - t0
    spark.catalog.clearCache()
    return sec, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execs", type=int, required=True)
    ap.add_argument("--variant", default="tools",
                    choices=["content", "tools", "tools2x"])
    ap.add_argument("--convs", type=int, default=400000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench
    from morra_spark.session import get_spark

    cores = args.execs * 2
    sp = cores * 2 if args.variant == "tools2x" else cores
    mpb = 8 << 20
    spark = get_spark(f"diag_{args.execs}_{args.variant}",
                      master=f"local-cluster[{args.execs},2,8192]",
                      shuffle_partitions=sp,
                      extra_conf={"spark.sql.adaptive.enabled": "false",
                                  "spark.sql.files.maxPartitionBytes": str(mpb),
                                  "spark.sql.files.openCostInBytes": "131072"})
    import zipfile

    zpath = f"/tmp/morra_spark_pyfiles_{os.getpid()}.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "morra_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    spark.sparkContext.addPyFile(zpath)

    tr = bench.ensure_transcripts(spark, args.convs)
    n_turns = spark.read.parquet(tr).count()
    run(spark, tr, args.variant)  # warmup
    for rep in range(args.reps):
        sec, n = run(spark, tr, args.variant)
        print(json.dumps({"execs": args.execs, "variant": args.variant,
                          "rep": rep, "sec": round(sec, 3), "n": n,
                          "turns_per_sec": round(n_turns / sec, 1)}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
