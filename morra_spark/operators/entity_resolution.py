"""Entity resolution: canonicalize entity surface forms at corpus scale.

KG construction (north star: "entity linking by lemma-normalized
candidate scoring, and canonicalization of surface forms") leaves one
gap after per-mention linking: the SAME real-world entity surfaces
under near-identical names across conversations ("Acme Corp",
"acme corp.", "Acme Cor" from an OCR/typo'd transcript). This module
merges those into one canonical entity with the classic
normalize → block → bounded fuzzy match → transitive closure pipeline
(cf. the blocking/entity-matching literature — Papadakis et al.,
"Blocking and Filtering Techniques for Entity Resolution", CSUR 2020).

Scale design (the part that matters at 10^12 turns):

1. **Fuzzy matching runs at the VOCABULARY grain, never the mention
   grain.** The first step collapses ids to DISTINCT normalized forms;
   everything quadratic-ish (pair generation, edit distance) touches
   only that vocab table (10^6–10^7 rows even for a 10^12-turn corpus),
   then a single hash join maps the canonical labels back to ids.
2. **Blocked pair generation, never all-pairs.** Two blocking keys
   (name prefix + head token) joined independently and unioned — a
   typo in the tail still shares the prefix key, a typo in the head
   still shares the head-token key. Each key is capped: blocks with
   more than ``block_cap`` distinct forms are excluded from fuzzy
   matching (exact merges still happen via the shared normalized
   form), so a degenerate key ("inc") can never go quadratic.
3. **Length prefilter before edit distance.** levenshtein(a, b) >=
   abs(len(a) - len(b)), so the join condition filters on length
   difference first and the JVM levenshtein only runs on survivors.
4. **Transitive closure via pointer-jumped connected components**
   (operators/components.py) — O(log diameter) join rounds, not a
   driver loop over pairs.

Everything is deterministic: canonical label = lexicographically
smallest normalized form in the component; canonical id = smallest
entity id mapping into the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from morra_spark.operators.components import connected_components


def normalize_name(col: F.Column) -> F.Column:
    """Lowercase, strip non-alphanumerics, collapse/trim whitespace.

    Mirrors the DuckDB oracle expression exactly (ASCII-safe regexes
    only, so both engines agree codepoint-for-codepoint).
    """
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", "")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def _blocked_pairs(forms: DataFrame, key: F.Column, max_dist: int,
                   block_cap: int) -> DataFrame:
    """(norm) → candidate (na, nb) pairs sharing one blocking key.

    ``forms`` must be distinct normalized names. Hot blocks (more than
    ``block_cap`` forms) are dropped from FUZZY matching — at corpus
    scale a degenerate key would otherwise cost |block|^2 comparisons.
    """
    keyed = forms.select(F.col("norm"), key.alias("bk"))
    capped = keyed.withColumn(
        "bn", F.count(F.lit(1)).over(Window.partitionBy("bk"))) \
        .filter(F.col("bn") <= block_cap).drop("bn")
    a = capped.select(F.col("norm").alias("na"), "bk")
    b = capped.select(F.col("norm").alias("nb"), "bk")
    return (a.join(b, "bk")
            .filter((F.col("na") < F.col("nb"))
                    & (F.abs(F.length("na") - F.length("nb")) <= max_dist))
            .filter(F.levenshtein("na", "nb") <= max_dist)
            .select("na", "nb"))


def resolve_entities(names: DataFrame, id_col: str = "entity_id",
                     name_col: str = "name", max_dist: int = 1,
                     block_cap: int = 200,
                     prefix_len: int = 4) -> DataFrame:
    """(id, name) → (id, name, canon_id, canon_name, cluster_size).

    ``canon_name`` is the lexicographically smallest normalized form in
    the entity's cluster, ``canon_id`` the smallest id mapping to the
    cluster, ``cluster_size`` the number of input ids it absorbs.
    Exact duplicates (same normalized form) always merge; fuzzy merges
    need edit distance <= ``max_dist`` under one of the two blocking
    keys. Deterministic for any input order / partitioning.
    """
    ids = names.select(F.col(id_col).alias("entity_id"),
                       F.col(name_col).alias("name")) \
        .withColumn("norm", normalize_name(F.col("name")))
    # vocab grain: every quadratic-ish step below sees only this table
    forms = ids.select("norm").distinct().localCheckpoint(eager=True)

    p1 = _blocked_pairs(forms, F.substring("norm", 1, prefix_len),
                        max_dist, block_cap)
    p2 = _blocked_pairs(forms, F.regexp_extract("norm", "[a-z0-9]+$", 0),
                        max_dist, block_cap)
    pairs = p1.unionByName(p2).distinct()

    comp = connected_components(pairs, src="na", dst="nb")
    canon = (forms.join(comp, forms["norm"] == comp["node"], "left")
             .select(forms["norm"],
                     F.coalesce(comp["comp"], forms["norm"])
                     .alias("canon_name")))
    mapped = ids.join(canon, "norm").select("entity_id", "name",
                                            "canon_name")
    clusters = mapped.groupBy("canon_name").agg(
        F.min("entity_id").alias("canon_id"),
        F.count(F.lit(1)).alias("cluster_size"))
    return mapped.join(clusters, "canon_name").select(
        "entity_id", "name", "canon_id", "canon_name", "cluster_size")
