"""Interval-overlap join (SURVEY.md §2 Part B join surface, the case
Spark's planner handles worst): find all pairs (a, b) with
``a.s <= b.e AND b.s <= a.e``. Written naively, that predicate has no
equi-key, so Spark plans a BroadcastNestedLoopJoin — quadratic work and
a broadcast of a whole side. This operator makes it an EQUI-join:

1. Each interval explodes to the fixed-width grid cells it covers
   (``sequence(floor(s/W), floor(e/W))`` — ≤ ceil(len/W)+1 cells, pure
   JVM built-ins).
2. Sides equi-join on the cell id (hash shuffle, AQE-skew-splittable).
3. Exact overlap verify on the original microsecond timestamps.
4. Dedup WITHOUT a distinct shuffle: a pair sharing k cells is kept
   only in the later interval's start cell (``greatest`` of the two
   start cells) — that cell is always covered by both sides of a true
   overlap, so each pair survives exactly once.

Pick ``cell_seconds`` near the typical interval length: too small
multiplies the explode fan-out, too large packs unrelated intervals
into the same cell (in-cell work is quadratic — a pathological hot
cell wants a smaller W or an AQE skew split, both config-only).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          cell_seconds: int,
                          id_col: str = "id", start_col: str = "s",
                          end_col: str = "e") -> DataFrame:
    """Pairs of overlapping [s, e] intervals across two sets, plus the
    overlap length in seconds. Inputs need (id, s, e) with s <= e;
    output is (a_id, b_id, overlap_sec)."""
    w_us = int(cell_seconds) * 1_000_000

    def cells(df: DataFrame, side: str) -> DataFrame:
        # cast: parquet NTZ timestamps -> TIMESTAMP (identity under the
        # session's pinned UTC) so unix_micros resolves
        su = F.unix_micros(F.col(start_col).cast("timestamp"))
        eu = F.unix_micros(F.col(end_col).cast("timestamp"))
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            su.alias(f"{side}_s"), eu.alias(f"{side}_e"),
            F.explode(F.sequence(
                F.floor(su / w_us), F.floor(eu / w_us))).alias("cell"))

    a, b = cells(left, "a"), cells(right, "b")
    first_cell = F.greatest(F.floor(F.col("a_s") / w_us),
                            F.floor(F.col("b_s") / w_us))
    return (a.join(b, "cell")
            .filter((F.col("a_s") <= F.col("b_e"))
                    & (F.col("b_s") <= F.col("a_e"))
                    & (F.col("cell") == first_cell))
            .select("a_id", "b_id",
                    F.round((F.least("a_e", "b_e")
                             - F.greatest("a_s", "b_s")) / 1_000_000.0,
                            2).alias("overlap_sec")))
