"""Per-conversation turn reassembly with explicit skew salting.

North-star mandate: "Turns are reassembled per conversation with a
window over (conv_id, turn_idx) to guarantee stable turn ordering and
per-turn text equality vs the reference" + "explicit salting for hot
conversations" (BASELINE.json; SURVEY.md §2 B-A5/B-J6, §4.2 skew row).

A plain ``groupBy(conv_id).collect_list`` funnels a 10^6-turn hot
conversation's every ROW through one reducer's sort. The salted
two-phase shape:

  phase 1: groupBy(conv_id, salt = pmod(xxhash64(turn_idx), k))
           → partial sorted chunks            (k-way split of hot convs)
  phase 2: groupBy(conv_id) → merge chunk arrays, flatten, final sort

HONEST BOUND (corrected in r2 — the r1 docstring overclaimed): phase 1
bounds the per-task aggregation state and shuffle-sort to
``|conv| / n_salt``; phase 2 necessarily materializes the ENTIRE
conversation array in one task, because the operator's OUTPUT is one
row per conversation — that |conv| memory floor is irreducible for this
output shape, not a fixable plan defect. What the two phases buy is the
heavy part: the row-level sort/aggregation is distributed, and phase 2
handles k pre-sorted chunk arrays instead of |conv| individual rows.
For consumers that can stream a conversation, use
``reassemble_conversations_chunked`` — contiguous bounded chunks end to
end, no task ever holds a whole hot conversation.

AQE's skew-join splitting does NOT cover aggregation skew — this must be
explicit (SURVEY.md §4.2).

Ordering stability: sorting structs by leading (turn_idx) inside
``sort_array`` is deterministic for the final order regardless of input
row order; a ``row_number`` over (conv_id, turn_idx) is exposed by
``with_turn_order`` for gap/dup detection (B-W1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_turn_order(df: DataFrame) -> DataFrame:
    """B-W1: stable ordering row_number + gap/dup flags per conversation."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (df.withColumn("turn_rank", F.row_number().over(w))
              .withColumn("prev_turn_idx", F.lag("turn_idx").over(w))
              .withColumn("turn_gap",
                          F.coalesce(F.col("turn_idx") - F.col("prev_turn_idx"),
                                     F.lit(1)) != 1)
              .drop("prev_turn_idx"))


def reassemble_conversations(df: DataFrame, n_salt: int = 16) -> DataFrame:
    """transcripts → one row per conversation with ordered turn array.

    Output: (conv_id, n_turns, turns array<struct<turn_idx,role,text>>,
    full_text). ``full_text`` joins per-turn texts with "\\n" in stable
    turn order — the per-turn text-equality invariant is asserted by
    comparing ``turns[i].text`` to the source rows (tests).
    """
    turn_struct = F.struct(
        F.col("turn_idx"), F.col("role"), F.col("text"))
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("turn_idx").cast("long")), F.lit(n_salt)))
    partial = (salted.groupBy("conv_id", "salt")
               .agg(F.sort_array(F.collect_list(turn_struct)).alias("chunk"),
                    F.count(F.lit(1)).alias("n")))
    merged = (partial.groupBy("conv_id")
              .agg(F.sort_array(F.flatten(F.collect_list("chunk"))).alias("turns"),
                   F.sum("n").alias("n_turns")))
    return merged.withColumn(
        "full_text",
        F.array_join(F.transform("turns", lambda t: t["text"]), "\n"))


def reassemble_conversations_chunked(df: DataFrame,
                                     chunk_size: int = 1024) -> DataFrame:
    """Bounded-state reassembly: one row per (conv_id, chunk_id) with a
    CONTIGUOUS ordered slice of ≤ ``chunk_size`` turns.

    Unlike ``reassemble_conversations`` (whose output shape forces the
    final merge task to hold a whole conversation), no task here ever
    materializes more than ``chunk_size`` turns: the ordering window's
    sort is external (spills), and the per-chunk groupBy state is
    bounded by construction. Consumers read chunks in (conv_id,
    chunk_id) order and stream; concatenating chunks reproduces the
    exact unchunked turn order (asserted in tests).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turn_struct = F.struct(F.col("turn_idx"), F.col("role"), F.col("text"))
    ranked = df.withColumn(
        "chunk_id",
        ((F.row_number().over(w) - 1) / F.lit(chunk_size)).cast("int"))
    return (ranked.groupBy("conv_id", "chunk_id")
            .agg(F.sort_array(F.collect_list(turn_struct)).alias("turns"),
                 F.count(F.lit(1)).alias("n_turns"))
            .orderBy("conv_id", "chunk_id"))
