"""Deterministic synthetic-fixture generator (FIXTURES.md).

Generates the ``transcripts`` input table (exact BASELINE.json:15 schema)
plus gold tables (``gold_tokens``, ``gold_triples``, ``lex_dict``,
``suffix_rules``) — all derivable by construction from the grammar.

Scale-correct design: generation itself is a Spark job — one row per
conversation fans out via ``mapInPandas``, each conversation seeded by its
own index, so output is byte-deterministic regardless of partitioning or
parallelism, and the same code generates 1k turns for tests or 10^9+ on a
cluster. Gold columns ride along as nested arrays on the turn row and are
split off by projection/explode — one generation pass, three tables.

Usage:  python -m morra_spark.fixtures --out DIR --convs 1000 [--hot-frac F]
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from morra_spark.grammar import Lexicon, gen_turn_text, tool_turn_text

EPOCH_2026 = 1767225600  # 2026-01-01T00:00:00Z

FULL_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp,"
    " g_tokens array<struct<token_id:int,start:int,len:int,form:string,"
    "lemma:string,upos:string,ne:string>>,"
    " g_triples array<struct<subj:string,pred:string,obj:string>>"
)

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_TOOLS = ["search", "code", "browser"]


def _conv_length(rng: random.Random, hot: bool, avg_len: int) -> int:
    if hot:
        # Zipf(a=1.5)-ish heavy tail x1000 (FIXTURES.md skew knob), capped
        u = max(rng.random(), 1e-9)
        return min(int(u ** (-2.0)) * 1000, 20000)
    return max(2, int(rng.gauss(avg_len, avg_len / 3)))


def _gen_conversation(lex: Lexicon, conv_i: int, seed: int, hot_frac: float,
                      gap_frac: float, avg_len: int) -> Iterator[dict]:
    rng = random.Random((seed << 32) ^ conv_i)
    conv_id = f"c{conv_i:08d}"
    hot = rng.random() < hot_frac
    n_content = _conv_length(rng, hot, avg_len)
    gapped = rng.random() < gap_frac
    start_ts = EPOCH_2026 + (hash_str(conv_id) % 100_000) * 60
    ts = float(start_ts)
    turn_idx = 0
    emitted = 0
    role_user = True
    while emitted < n_content:
        ts += rng.uniform(5.0, 90.0)
        role = "user" if role_user else "assistant"
        text, toks, triples = gen_turn_text(lex, rng)
        yield {
            "conv_id": conv_id, "turn_idx": turn_idx, "role": role,
            "text": text, "tool": None,
            "ts": pd.Timestamp(int(ts * 1e6), unit="us", tz="UTC"),
            "g_tokens": [
                {"token_id": j, "start": t.start, "len": len(t.form),
                 "form": t.form, "lemma": t.lemma, "upos": t.upos, "ne": t.ne}
                for j, t in enumerate(toks)
            ],
            "g_triples": [{"subj": s, "pred": p, "obj": o} for s, p, o in triples],
        }
        emitted += 1
        turn_idx += 1
        if gapped and rng.random() < 0.15:
            turn_idx += 1  # 2% of convs get gapped indices (gap detection)
        # 15% tool turns inserted after assistant turns. Gold for the
        # tool-turn alignment operator: the tool use is attributed to the
        # invoking turn's subject — the lexicographically smallest subj
        # among that turn's triples (order-independent, so the pipeline
        # can derive it from its own extraction without relying on
        # intra-turn triple order). No invoking triples -> no gold.
        if role == "assistant" and rng.random() < 0.15:
            ts += rng.uniform(5.0, 90.0)
            tool_name = rng.choice(_TOOLS)
            g_tool = ([{"subj": min(s for s, _p, _o in triples),
                        "pred": "used_tool", "obj": tool_name}]
                      if triples else [])
            yield {
                "conv_id": conv_id, "turn_idx": turn_idx, "role": "tool",
                "text": tool_turn_text(rng), "tool": tool_name,
                "ts": pd.Timestamp(int(ts * 1e6), unit="us", tz="UTC"),
                "g_tokens": [], "g_triples": g_tool,
            }
            turn_idx += 1
            if gapped and rng.random() < 0.15:
                turn_idx += 1
        role_user = not role_user


def hash_str(s: str) -> int:
    """Stable string hash (zlib.crc32) — NOT Python's salted hash()."""
    import zlib

    return zlib.crc32(s.encode("utf-8"))


def gen_full(spark: SparkSession, n_convs: int, seed: int = 42,
             hot_frac: float = 0.0001, gap_frac: float = 0.02,
             avg_len: int = 12) -> DataFrame:
    """Turn rows + nested gold columns, distributed over conversations."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lex = Lexicon(seed=seed)
        for pdf in batches:
            rows: list[dict] = []
            for conv_i in pdf["id"]:
                rows.extend(_gen_conversation(lex, int(conv_i), seed,
                                              hot_frac, gap_frac, avg_len))
                if len(rows) >= 20000:
                    yield pd.DataFrame(rows)
                    rows = []
            if rows:
                yield pd.DataFrame(rows)

    n_parts = max(1, min(n_convs, spark.sparkContext.defaultParallelism * 2))
    base = spark.range(0, n_convs, numPartitions=n_parts)
    return base.mapInPandas(gen, schema=FULL_SCHEMA)


def write_fixtures(spark: SparkSession, out_dir: str, n_convs: int,
                   seed: int = 42, hot_frac: float = 0.0001,
                   shuffle_rows: bool = True) -> None:
    """Write transcripts + gold tables under ``out_dir``.

    ``transcripts`` is partitioned by ``part=pmod(xxhash64(conv_id),16)``
    (same layout the triple sink uses) and row-order-shuffled within
    partitions so ordering-invariance is exercised by every consumer.
    """
    full = gen_full(spark, n_convs, seed=seed, hot_frac=hot_frac)
    full = full.withColumn("part", F.pmod(F.xxhash64("conv_id"), F.lit(16)).cast("int"))
    full.persist()
    try:
        tr = full.select(*TRANSCRIPT_COLS, "part")
        if shuffle_rows:  # scramble intra-file row order (ordering invariance)
            tr = tr.repartition(16, "part").sortWithinPartitions(
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(997)))
        tr.write.mode("overwrite").partitionBy("part").parquet(f"{out_dir}/transcripts")

        (full.select("conv_id", "turn_idx", F.explode("g_tokens").alias("t"))
             .select("conv_id", "turn_idx", "t.token_id", "t.start", "t.len",
                     "t.form", "t.lemma", "t.upos", "t.ne")
             .write.mode("overwrite").parquet(f"{out_dir}/gold_tokens"))

        (full.select("conv_id", "turn_idx", F.explode("g_triples").alias("t"))
             .select("conv_id", "turn_idx", "t.subj", "t.pred", "t.obj")
             .write.mode("overwrite").parquet(f"{out_dir}/gold_triples"))
    finally:
        full.unpersist()

    lex = Lexicon(seed=seed)
    lex_rows = [(form, upos, lemma, 10)
                for form, (lemma, upos) in sorted(lex.token_lemma.items())]
    spark.createDataFrame(lex_rows, "form_norm string, upos string, lemma string, freq long") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/lex_dict")

    spark.createDataFrame(lex.suffix_rules(),
                          "upos string, suffix string, replace string, freq long") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/suffix_rules")

    ent_rows = sorted((c, t) for c, t in lex.entity_type.items())
    spark.createDataFrame(ent_rows, "canonical string, ne_type string") \
        .coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/entity_dict")


def main() -> None:
    import argparse

    from morra_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--convs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hot-frac", type=float, default=0.0001)
    args = ap.parse_args()
    spark = get_spark("fixtures")
    write_fixtures(spark, args.out, args.convs, seed=args.seed,
                   hot_frac=args.hot_frac)
    n = spark.read.parquet(f"{args.out}/transcripts").count()
    print(f"wrote {n} turns across {args.convs} conversations to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
