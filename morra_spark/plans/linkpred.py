"""Link-prediction benchmark runner — the composed lifecycle job that
turns this repo's link-prediction pieces into one reproducible
evaluation: hold out a deterministic fraction of edges, score the
train graph's distance-2 candidates with the topological baselines
(``components.link_scores``), label candidates against the held-out
set, and read out MRR / Hits@k through ``plans.evaluate.
ranking_metrics``.

    python -m morra_spark.plans.linkpred \
        --pairs /path/to/edges --src subj --dst obj --out /tmp/lp

Why a runner: ``link_scores`` is the baseline any learned KG-embedding
model must beat, but "must beat" needs a protocol — which edges were
hidden, which candidates were scored, how ranks break ties. This
module pins that protocol the same way ``plans/pretrain.py`` pins the
curate→split→pack order:

* the holdout is a portable-md5 decision per canonical edge (the
  ``curation.split_assign`` discipline) — retry / partitioning /
  engine invariant, so train and test sets are bit-stable;
* candidates are the TRAIN graph's distance-2 non-edges (exactly what
  ``link_scores`` emits — held-out edges farther than 2 hops in the
  train graph are unreachable by ANY common-neighbor method, and are
  reported as such in ``coverage`` rather than silently dropped);
* each unordered candidate pair is ranked from BOTH endpoints
  (query=a ranking b, and query=b ranking a — the standard per-node
  protocol), positives = held-out edges, ties broken by candidate id
  (the ``ranking_metrics`` determinism rule).

100 TB shape: nothing beyond its parts — one canonical distinct, one
map-only md5 split, ``link_scores``' hub-capped wedge join, one
broadcast-sized metrics aggregate. The returned summary is a bounded
driver dict (the ``run_kg_report`` pattern); artifacts land under
``out_dir`` when given (``candidates/`` at scored-pair grain,
``metrics/`` the 1-row read-out).
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_linkpred_benchmark(pairs: DataFrame, *, src: str = "src",
                           dst: str = "dst", holdout_frac: float = 0.2,
                           seed: int = 13, score_col: str = "adamic_adar",
                           hub_cap: int = 256,
                           ks: tuple[int, ...] = (1, 3, 10),
                           out_dir: str | None = None) -> dict:
    """Run the benchmark; returns a flat summary dict (counts +
    coverage + mrr/hits_k for the chosen ``score_col``)."""
    from morra_spark.operators.components import (_canon_undirected,
                                                  link_scores)
    from morra_spark.operators.curation import _portable_bucket
    from morra_spark.plans.evaluate import ranking_metrics

    if not 0.0 < holdout_frac < 1.0:
        raise ValueError(
            f"holdout_frac must be in (0, 1), got {holdout_frac}")
    if score_col not in ("cn", "adamic_adar", "jaccard"):
        raise ValueError(f"unknown score_col {score_col!r}")

    canon = _canon_undirected(pairs, src, dst).localCheckpoint(eager=True)
    # portable-md5 edge split (the shared split_assign/_portable_bucket
    # definition — NOT a re-implementation, so a change to the portable
    # hash can never diverge this split from the curation splits)
    bucket = _portable_bucket(
        F.concat_ws("|", F.lit(str(seed)), "x", "y"), 1_000_000)
    tagged = canon.withColumn(
        "_test", bucket < int(holdout_frac * 1_000_000))
    train = tagged.filter(~F.col("_test")).drop("_test") \
        .localCheckpoint(eager=True)
    test = tagged.filter("_test").drop("_test").localCheckpoint(eager=True)

    # link_scores emits canonical (a, b) with a < b — same id space as
    # the canonical (x, y) test edges
    scored = link_scores(train, src="x", dst="y", hub_cap=hub_cap)
    # label candidates against the held-out set; rank each unordered
    # pair from both endpoints (per-node ranking protocol)
    labeled = (scored.join(test.select(F.col("x").alias("a"),
                                       F.col("y").alias("b"),
                                       F.lit(True).alias("_pos")),
                           ["a", "b"], "left")
               .withColumn("is_pos", F.coalesce("_pos", F.lit(False)))
               .drop("_pos")
               # the wedge join is the dominant cost and feeds FOUR
               # actions below (both union branches of the metrics
               # read, the reachable count, and the artifact writes) —
               # materialize it ONCE (the kg_report shared-scan rule)
               .localCheckpoint(eager=True))
    directed = (labeled.select(F.col("a").alias("query"),
                               F.col("b").alias("cand"),
                               score_col, "is_pos")
                .unionByName(labeled.select(
                    F.col("b").alias("query"), F.col("a").alias("cand"),
                    score_col, "is_pos")))
    # 1-row frame consumed by first() AND an optional write — cut once
    metrics = ranking_metrics(directed, query_cols=("query",),
                              cand_col="cand", score_col=score_col,
                              ks=ks, filtered=True) \
        .localCheckpoint(eager=True)

    n_edges, n_test = canon.count(), test.count()
    n_reachable = labeled.filter("is_pos").count()
    row = metrics.first()
    summary = {
        "n_edges": n_edges, "n_train": n_edges - n_test,
        "n_test": n_test,
        # held-out edges at distance > 2 in the train graph are
        # unreachable by any common-neighbor method: honest coverage,
        # not silent truncation (the no-silent-caps rule)
        "n_test_reachable": n_reachable,
        "coverage": round(n_reachable / n_test, 6) if n_test else 0.0,
        "score_col": score_col,
        "n_queries": int(row["n_queries"] or 0),
        "n_pos": int(row["n_pos"] or 0),
        "mrr": round(float(row["mrr"]), 6) if row["mrr"] is not None
        else None,
    }
    for k in ks:
        v = row[f"hits_{k}"]
        summary[f"hits_{k}"] = round(float(v), 6) if v is not None else None
    if out_dir is not None:
        labeled.write.mode("overwrite") \
            .parquet(f"{out_dir}/candidates")
        metrics.write.mode("overwrite").parquet(f"{out_dir}/metrics")
    return summary


def main() -> None:
    from morra_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pairs", required=True,
                    help="edge-pair parquet (e.g. the kg_report edges/)")
    ap.add_argument("--src", default="src")
    ap.add_argument("--dst", default="dst")
    ap.add_argument("--out", default=None)
    ap.add_argument("--holdout-frac", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--score-col", default="adamic_adar",
                    choices=("cn", "adamic_adar", "jaccard"))
    ap.add_argument("--hub-cap", type=int, default=256)
    ap.add_argument("--json", action="store_true",
                    help="print ONE machine-readable JSON line (the "
                         "bench.py convention) instead of the table")
    args = ap.parse_args()
    spark: SparkSession = get_spark("linkpred")
    s = run_linkpred_benchmark(
        spark.read.parquet(args.pairs), src=args.src, dst=args.dst,
        holdout_frac=args.holdout_frac, seed=args.seed,
        score_col=args.score_col, hub_cap=args.hub_cap, out_dir=args.out)
    if args.json:
        import json
        print(json.dumps(s))
    else:
        for k, v in s.items():
            print(f"{k:>18}: {v}")


if __name__ == "__main__":
    main()
