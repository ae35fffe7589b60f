"""The flagship KG-construction job, end to end.

Plan shape (SURVEY.md §4.3): Scan → [ArrowEval: tokenize+tag+NER+spans+
triples, map-only] → explode triples → BroadcastHashJoin(entity dict,
linking/canonicalization) → Exchange(part_key) → partitioned write, plus
the checkpoint sink. Exactly one shuffle on the triple path (the final
repartition-by-part_key) + broadcast joins; turn reassembly (its own
salted two-phase aggregation) is a separate branch.

Entity linking (north star: "entity linking by lemma-normalized
candidate scoring"): mention/endpoint lemma_norm → broadcast join against
the candidate dictionary → highest-frequency candidate wins via a
ranking window (SURVEY.md §2 B-J1 + B-W2) → canonical surface replaces
the raw lemma_norm in the emitted triple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from morra_spark.model_artifact import KGModel
from morra_spark.operators.tagger import extract_turn_triples
from morra_spark.plans import checkpoint as CK

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def load_transcripts(spark: SparkSession, path: str,
                     min_parallelism: int | None = None) -> DataFrame:
    """B-S1 scan. Parquet locally; on a cluster with the Iceberg runtime
    this is ``spark.read.table(...)`` — same downstream plan.

    ``min_parallelism``: when the input has fewer splits than this
    (small local files — at 100 TB the scan naturally has thousands of
    splits and this never triggers), redistribute by conv_id hash so the
    map-only annotate stage uses every core. Hash-repartition, NOT
    coalesce, so hot conversations spread too.
    """
    df = spark.read.parquet(path).select(*TRANSCRIPT_COLS)
    if min_parallelism is None:
        min_parallelism = spark.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() < min_parallelism:
        df = df.repartition(min_parallelism, "conv_id", "turn_idx")
    return df


def entity_candidates_df(spark: SparkSession, model: KGModel) -> DataFrame:
    """Candidate dictionary (canonical, ne_type, freq) for linking —
    tiny, always broadcast. Built via pandas so Catalyst plans a
    LocalTableScan (an RDD-backed createDataFrame would spin up Python
    workers on every reuse of the broadcast build side)."""
    import pandas as pd

    rows = sorted(model.entity_type.items())
    pdf = pd.DataFrame({"canonical": [c for c, _ in rows],
                        "ne_type": [t for _, t in rows],
                        "freq": [10] * len(rows)})
    return spark.createDataFrame(pdf)


def link_endpoints(triples: DataFrame, candidates: DataFrame) -> DataFrame:
    """Canonicalize subj/obj by candidate scoring: B-W2 ranking window
    picks the argmax-freq candidate per (canonical, ne_type) key — run on
    the TINY candidate side so the big triple stream stays map-only —
    then B-J1 broadcast left joins per endpoint. Unlinked endpoints keep
    their lemma-normalized surface (already canonical lemmata).

    At 100 TB the triple stream must not shuffle here: a ranking window
    over the stream itself would add one exchange per endpoint; ranking
    the dictionary instead is equivalent (the join key is the window's
    partition key) and free."""
    w = Window.partitionBy("canonical", "ne_type").orderBy(F.desc("freq"))
    best = (candidates.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn", "freq"))
    for side in ("subj", "obj"):
        c = F.broadcast(best.select(
            F.col("canonical").alias(f"{side}_cand"),
            F.col("ne_type").alias(f"{side}_cand_ne")))
        triples = (triples.join(
            c, (F.col(side) == F.col(f"{side}_cand"))
            & (F.col(f"{side}_ne") == F.col(f"{side}_cand_ne")), "left")
            .withColumn(side, F.coalesce(F.col(f"{side}_cand"), F.col(side)))
            .drop(f"{side}_cand", f"{side}_cand_ne"))
    return triples


TOOL_PRED = "used_tool"


def tool_candidate_triples(turns: DataFrame, ann: DataFrame,
                           n_parts: int = 64) -> DataFrame:
    """Tool-turn alignment → (subj, 'used_tool', tool_name) candidates.

    Each ``role='tool'`` turn is attributed to its INVOKING turn — the
    nearest preceding non-tool turn of the same conversation — and emits
    one candidate triple at the tool turn's (conv_id, turn_idx). The
    subject is the lexicographically smallest subj among the invoking
    turn's extracted triples (order-independent, so stable under any
    intra-turn extraction order and equal to the fixtures' gold rule);
    tool turns whose invoking turn yielded no triples emit nothing.

    Spark-first shape: a range join of tool turns against content turns
    would work (B-J4 — the oracled ``range_join``/``tool_alignment``
    queries prove that plan), but same-table alignment is cheaper as ONE
    ordering window over (conv_id, turn_idx) on a narrow projection
    (SURVEY §2 B-W1): no join, a single slim shuffle, and window state
    is one struct per row, so hot conversations cannot OOM it.
    """
    first = ann
    if "role" in first.columns:
        first = first.filter(F.col("role") != "tool")
    inv_min = F.array_min(F.transform(
        "triples", lambda t: F.struct(t["subj"].alias("inv_subj"),
                                      t["subj_ne"].alias("inv_subj_ne"))))
    first = (first.filter(F.size("triples") > 0)
             .select("conv_id", "turn_idx", inv_min.alias("m"))
             .select("conv_id", "turn_idx", "m.inv_subj", "m.inv_subj_ne"))
    seq = (turns.select("conv_id", "turn_idx", "role", "tool")
           .join(first, ["conv_id", "turn_idx"], "left"))
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    inv = F.last(F.when(F.col("role") != "tool",
                        F.struct("inv_subj", "inv_subj_ne")),
                 ignorenulls=True).over(w)
    tool_rows = (seq.withColumn("inv", inv)
                 .filter((F.col("role") == "tool")
                         & F.col("tool").isNotNull()
                         & F.col("inv.inv_subj").isNotNull())
                 .select("conv_id", "turn_idx",
                         F.col("inv.inv_subj").alias("subj"),
                         F.lit(TOOL_PRED).alias("pred"),
                         F.col("tool").alias("obj"),
                         F.col("inv.inv_subj_ne").alias("subj_ne"),
                         F.lit("Tool").alias("obj_ne")))
    return CK.add_part_key(tool_rows, n_parts)


def extract_triples(ann: DataFrame, candidates: DataFrame,
                    turns: DataFrame | None = None,
                    n_parts: int = 64) -> DataFrame:
    """turns_annotated → linked, canonicalized triple rows.

    With ``turns`` (the raw transcript rows including tool turns), the
    tool-turn alignment branch contributes (subj, 'used_tool', tool)
    candidates, unioned BEFORE linking so tool-use subjects canonicalize
    through the same broadcast dictionary as everything else.
    """
    t = ann
    if "role" in t.columns:
        t = t.filter(F.col("role") != "tool")
    t = (t.select("conv_id", "turn_idx", "part_key",
                  F.explode("triples").alias("t"))
         .select("conv_id", "turn_idx", "part_key",
                 "t.subj", "t.pred", "t.obj", "t.subj_ne", "t.obj_ne"))
    if turns is not None:
        t = t.unionByName(tool_candidate_triples(turns, ann, n_parts))
    return link_endpoints(t, candidates)


def run_pipeline(spark: SparkSession, *, transcripts_path: str, out_dir: str,
                 model_path: str, run_id: str | None = None,
                 n_parts: int = 64) -> dict:
    """Full resumable job: annotate+extract → triples sink + checkpoint.

    Returns summary counters. Re-running with the same ``run_id`` after a
    partial failure skips completed part_keys (idempotent resume).
    """
    model = KGModel.load(model_path)
    model_bc = spark.sparkContext.broadcast(model)
    candidates = entity_candidates_df(spark, model)

    run_id = run_id or CK.new_run_id()
    triples_dir = f"{out_dir}/triples"
    ckpt_dir = f"{out_dir}/checkpoint"

    src = load_transcripts(spark, transcripts_path)
    src = CK.add_part_key(src, n_parts)

    def transform(pending: DataFrame) -> DataFrame:
        # role filter runs JVM-side BEFORE the Python stage; the slim
        # triples-only schema keeps token/mention arrays out of the
        # Arrow transfer entirely (they are recomputable, not needed by
        # the triple sink). Tool turns skip annotation but feed the
        # alignment branch (used_tool triples).
        src_all = pending.drop("part_key")
        content = src_all.filter(F.col("role") != "tool")
        ann = CK.add_part_key(extract_turn_triples(content, model_bc), n_parts)
        out = extract_triples(ann, candidates, turns=src_all, n_parts=n_parts)
        # hot-conversation salting for the sink: part_key alone would put a
        # 10^6-turn conversation's triples in one write task; spreading by
        # turn_idx-hash salt inside repartition keeps tasks bounded while
        # the directory layout stays partitionBy(part_key).
        return out.repartition(
            F.col("part_key"),
            F.pmod(F.xxhash64("turn_idx"), F.lit(8)))

    CK.run_stage(spark, input_df=src, stage="extract_triples", run_id=run_id,
                 out_dir=triples_dir, ckpt_dir=ckpt_dir, transform=transform)

    triples = spark.read.parquet(triples_dir)
    n_triples = triples.count()
    return {"run_id": run_id, "n_triples": n_triples,
            "triples_dir": triples_dir, "ckpt_dir": ckpt_dir}
