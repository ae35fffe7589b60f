"""Per-conversation turn reassembly with explicit skew salting.

North-star mandate: "Turns are reassembled per conversation with a
window over (conv_id, turn_idx) to guarantee stable turn ordering and
per-turn text equality vs the reference" + "explicit salting for hot
conversations" (BASELINE.json; SURVEY.md §2 B-A5/B-J6, §4.2 skew row).

A plain ``groupBy(conv_id).collect_list`` dies on a 10^6-turn hot
conversation: one reducer gets the whole conversation. The salted
two-phase shape bounds any single task's state to ``|conv| / n_salt``:

  phase 1: groupBy(conv_id, salt = pmod(xxhash64(turn_idx), k))
           → partial sorted chunks            (k-way split of hot convs)
  phase 2: groupBy(conv_id) → merge chunk arrays, flatten, final sort

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
