"""Batch curation pipeline runner (the production form of
``__spark_entry__.q_curation_funnel``): quality gate → exact dedup →
n-gram-Jaccard near-dup clustering over a documents table, materializing
the survivor corpus plus the per-stage funnel report.

    python -m morra_spark.plans.curate --docs <parquet> --out <dir>

Unlike the oracle query (which labels every doc in one plan so DuckDB
can replay it), the runner MATERIALIZES the survivor set — the thing a
curation run actually ships — and derives the report from the same
labeled frame, so the two cannot drift. Output:

    {out}/survivors/   surviving (doc_id, text, ...) rows
    {out}/report/      (stage, n_docs, n_tokens) funnel accounting
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def label_documents(docs: DataFrame, n: int = 3,
                    min_jaccard: float = 0.05,
                    df_cap: int = 100,
                    entropy_min: float | None = None,
                    adaptive_length: bool = False) -> DataFrame:
    """Every input doc labeled with the funnel stage that dropped it
    ('too_short'/'too_long'/'low_en'/'exact_dup'/'near_dup') or 'kept'.
    Single-pass: quality CASE + text-key rank + component join feed one
    CASE — no per-stage recount of the corpus.

    Opt-in extra gates, applied after the base quality CASE and before
    the dedup cascade (both default OFF, keeping the oracle query's
    labeling bit-identical):

    - ``entropy_min``: drop docs whose char Shannon entropy is below the
      threshold (stage ``low_entropy``; ``operators.curation.char_entropy``);
    - ``adaptive_length``: drop per-language token-count outliers
      outside the lang's exact [p05, p95] (stage ``len_outlier``;
      ``operators.curation.adaptive_length_bounds`` — requires a
      ``lang`` column).
    """
    from morra_spark.operators.components import connected_components
    from morra_spark.operators.dedup import ngram_jaccard_pairs
    from morra_spark.streaming.curation import quality_reason

    staged = docs.withColumn("qreason", quality_reason())
    if entropy_min is not None:
        from morra_spark.operators.curation import char_entropy

        ent = char_entropy(docs.select("doc_id", "text"),
                           min_bits=entropy_min) \
            .select("doc_id", "low_entropy")
        staged = (staged.join(ent, "doc_id", "left")
                  .withColumn("qreason", F.coalesce(
                      F.col("qreason"),
                      F.when(F.coalesce(F.col("low_entropy"),
                                        F.lit(True)), "low_entropy")))
                  .drop("low_entropy"))
    if adaptive_length:
        from morra_spark.operators.curation import adaptive_length_bounds

        if "lang" not in docs.columns:
            raise ValueError("adaptive_length requires a 'lang' column")
        # calibrate the p05/p95 bounds on the CURRENT survivor set, not
        # the raw input — otherwise a flood of already-rejected
        # too_short/too_long spam drags the percentiles into mass the
        # gate can never see again; NULL lang coalesces to 'und' so
        # those docs are gated too (an inner join on NULL would silently
        # exempt them)
        gate_src = staged.filter(F.col("qreason").isNull()).select(
            "doc_id", F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            "text")
        bounds = adaptive_length_bounds(gate_src).select("doc_id", "keep")
        staged = (staged.join(bounds, "doc_id", "left")
                  .withColumn("qreason", F.coalesce(
                      F.col("qreason"),
                      F.when(~F.coalesce(F.col("keep"), F.lit(True)),
                             "len_outlier")))
                  .drop("keep"))
    passed = staged.filter(F.col("qreason").isNull())
    exact = passed.select("doc_id", "text").withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("text").orderBy("doc_id")))
    surv = exact.filter(F.col("rn") == 1).select("doc_id", "text")
    comp = connected_components(
        ngram_jaccard_pairs(surv, n=n, min_jaccard=min_jaccard,
                            df_cap=df_cap).select("da", "db"),
        src="da", dst="db")
    return (staged
            .join(exact.select("doc_id", "rn"), "doc_id", "left")
            .join(comp.withColumnRenamed("node", "doc_id"),
                  "doc_id", "left")
            .withColumn("stage", F.coalesce(
                F.col("qreason"),
                F.when(F.col("rn") > 1, "exact_dup"),
                F.when(F.col("comp") < F.col("doc_id"), "near_dup"),
                F.lit("kept")))
            .drop("qreason", "rn", "comp"))


def run_curation(spark: SparkSession, *, docs_path: str, out_dir: str,
                 n: int = 3, min_jaccard: float = 0.05,
                 df_cap: int = 100, entropy_min: float | None = None,
                 adaptive_length: bool = False) -> dict:
    """Materialize survivors + funnel report; returns the report rows.

    The labeled frame is localCheckpointed once so the survivor write
    and the report aggregate share one computation of the (expensive)
    dedup cascade instead of running it twice."""
    docs = spark.read.parquet(docs_path)
    labeled = label_documents(docs, n=n, min_jaccard=min_jaccard,
                              df_cap=df_cap, entropy_min=entropy_min,
                              adaptive_length=adaptive_length) \
        .localCheckpoint(eager=False)
    (labeled.filter(F.col("stage") == "kept").drop("stage")
     .write.mode("overwrite").parquet(f"{out_dir}/survivors"))
    # the SHARED token definition (operators.curation.ws_token_count) —
    # an inlined split(' ') counted empty text as 1 token and single-
    # space-only splitting disagreed with packing/mixture/length-gate
    # accounting over the same docs (code-review r5, exactly the drift
    # the helper's docstring warns against)
    from morra_spark.operators.curation import ws_token_count

    report = (labeled.withColumn("n_tok", ws_token_count())
              .groupBy("stage")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("n_tok").cast("long").alias("n_tokens"))
              .orderBy("stage"))
    report.write.mode("overwrite").parquet(f"{out_dir}/report")
    return {r["stage"]: (r["n_docs"], r["n_tokens"])
            for r in report.collect()}


def main() -> None:
    from morra_spark.session import get_spark

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True,
                    help="documents parquet path (doc_id, text, ...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--min-jaccard", type=float, default=0.05)
    ap.add_argument("--df-cap", type=int, default=100)
    ap.add_argument("--entropy-min", type=float, default=None,
                    help="drop docs below this char-entropy (bits)")
    ap.add_argument("--adaptive-length", action="store_true",
                    help="drop per-lang [p05, p95] token-count outliers")
    args = ap.parse_args()
    spark = get_spark("curate")
    rep = run_curation(spark, docs_path=args.docs, out_dir=args.out,
                       n=args.ngram, min_jaccard=args.min_jaccard,
                       df_cap=args.df_cap, entropy_min=args.entropy_min,
                       adaptive_length=args.adaptive_length)
    for stage, (nd, nt) in sorted(rep.items()):
        print(f"{stage:>10}: {nd} docs, {nt} tokens")


if __name__ == "__main__":
    main()
