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
    canon = _form_clusters(ids.select("norm").distinct(),
                           max_dist, block_cap, prefix_len) \
        .withColumnRenamed("cluster", "canon_name")
    mapped = ids.join(canon, "norm").select("entity_id", "name",
                                            "canon_name")
    clusters = mapped.groupBy("canon_name").agg(
        F.min("entity_id").alias("canon_id"),
        F.count(F.lit(1)).alias("cluster_size"))
    return mapped.join(clusters, "canon_name").select(
        "entity_id", "name", "canon_id", "canon_name", "cluster_size")


def _form_clusters(forms: DataFrame, max_dist: int, block_cap: int,
                   prefix_len: int) -> DataFrame:
    """Distinct (norm) → (norm, cluster): the fuzzy-closure cluster
    label (lexicographically smallest member form; the form itself when
    nothing merges). The vocab-grain core shared by id-level resolution
    and weighted surface-form canonicalization."""
    forms = forms.localCheckpoint(eager=True)  # feeds 3 consumers
    p1 = _blocked_pairs(forms, F.substring("norm", 1, prefix_len),
                        max_dist, block_cap)
    p2 = _blocked_pairs(forms, F.regexp_extract("norm", "[a-z0-9]+$", 0),
                        max_dist, block_cap)
    pairs = p1.unionByName(p2).distinct()
    comp = connected_components(pairs, src="na", dst="nb")
    return (forms.join(comp, forms["norm"] == comp["node"], "left")
            .select(forms["norm"],
                    F.coalesce(comp["comp"], forms["norm"])
                    .alias("cluster")))


def surface_form_map(names: DataFrame, name_col: str = "name",
                     weight_col: str | None = None, max_dist: int = 1,
                     block_cap: int = 200,
                     prefix_len: int = 4) -> DataFrame:
    """(name[, weight]) → (name, canon): fuzzy canonicalization map
    where the cluster representative is the dominant ORIGINAL spelling:
    the heaviest normalized form in the cluster (ties to the smallest
    form) picks the cluster, and the heaviest raw name within that form
    (ties to the smallest name) is the canon — for mention
    canonicalization the dominant spelling is the right survivor, not
    the lexicographic minimum and NOT the lowercased/punct-stripped
    normalization ("alice smit" must fold INTO "alice smith", which
    out-mentions it 100:1; a singleton "Acme Corp." maps to ITSELF,
    case and punctuation intact — code-review r5: the old version
    rewrote every endpoint to its normalized form, destroying
    case/punctuation corpus-wide and breaking joins against tables
    keyed on the original surface). With no ``weight_col`` every
    distinct name votes once.

    Output is vocab-grain (one row per distinct input name), so the
    downstream rewrite join broadcasts for any realistic entity
    vocabulary.
    """
    ids = names.select(
        F.col(name_col).alias("name"),
        (F.col(weight_col) if weight_col else F.lit(1)).alias("w")) \
        .withColumn("norm", normalize_name(F.col("name")))
    wname = ids.groupBy("name", "norm").agg(F.sum("w").alias("w"))
    wn = wname.groupBy("norm").agg(F.sum("w").alias("w"))
    clustered = _form_clusters(wn.select("norm"), max_dist, block_cap,
                               prefix_len).join(wn, "norm")
    # two-level dominant pick, each level min_by over (-w, key):
    # heaviest first, ties to the smallest
    rep_norm = clustered.groupBy("cluster").agg(
        F.expr("min_by(norm, struct(-w, norm))").alias("rep_norm"))
    best_name = wname.groupBy("norm").agg(
        F.expr("min_by(name, struct(-w, name))").alias("canon"))
    rep = (rep_norm.join(best_name.withColumnRenamed("norm", "rep_norm"),
                         "rep_norm")
           .select("cluster", "canon"))
    mapping = clustered.join(rep, "cluster").select("norm", "canon")
    return (ids.select("name", "norm").distinct()
            .join(mapping, "norm").select("name", "canon"))


def admit_surface_forms(existing_map: DataFrame, new_names: DataFrame,
                        name_col: str = "name", max_dist: int = 1,
                        block_cap: int = 200,
                        prefix_len: int = 4) -> DataFrame:
    """Incremental entity resolution: admit a DELTA of surface forms
    against a FROZEN canonical vocabulary.

    A daily/streaming KG build cannot re-cluster the whole entity
    vocabulary per batch — and must not: downstream tables key on
    yesterday's canonical forms, so admission has to leave existing
    canons untouched (the same frozen-state contract as
    ``dedup.incremental_admission``). Each new name resolves by a fixed
    priority:

    1. **exact** — its normalized form already exists → adopt that
       form's canon;
    2. **fuzzy** — a blocked edit-distance match to an existing form →
       adopt the NEAREST match's canon (ties: smallest canon, then
       smallest matched form — fully deterministic);
    3. **new cluster** — forms matching only other new forms cluster
       among themselves (same pointer-jumped closure, delta-sized);
    4. **singleton** — maps to itself.

    Returns (name, canon) for the NEW names only; union with
    ``existing_map`` for the updated vocabulary. Scale shape: the delta
    is small by definition; the existing vocabulary is vocab-grain; the
    fuzzy step is one blocked join delta×vocab with the same per-key
    cap and length prefilter as the batch path — never all-pairs,
    never mention-grain.
    """
    ex = existing_map.select(
        normalize_name(F.col("name")).alias("norm"),
        F.col("canon")).groupBy("norm").agg(
        F.min("canon").alias("canon"))  # defensive: one canon per norm
    new = new_names.select(F.col(name_col).alias("name")) \
        .withColumn("norm", normalize_name(F.col("name"))).distinct()

    # (1) exact adopt
    exact = new.join(ex, "norm").select("name", "norm", "canon")
    rest = new.join(ex, "norm", "left_anti") \
        .select("norm").distinct().localCheckpoint(eager=True)

    # (2) fuzzy adopt against the frozen vocab (delta x vocab, blocked)
    ex_forms = ex.select("norm").localCheckpoint(eager=True)

    def _keyed(df, prefix):
        k1 = df.select(F.col("norm").alias(f"{prefix}n"),
                       F.substring("norm", 1, prefix_len).alias("bk"))
        k2 = df.select(F.col("norm").alias(f"{prefix}n"),
                       F.regexp_extract("norm", "[a-z0-9]+$", 0)
                       .alias("bk"))
        return k1.unionByName(k2).distinct()

    ex_keyed = _keyed(ex_forms, "e").withColumn(
        "bn", F.count(F.lit(1)).over(Window.partitionBy("bk"))) \
        .filter(F.col("bn") <= block_cap).drop("bn")
    cand = (_keyed(rest, "d").join(ex_keyed, "bk")
            .filter((F.abs(F.length("dn") - F.length("en")) <= max_dist))
            .withColumn("dist", F.levenshtein("dn", "en"))
            .filter(F.col("dist") <= max_dist)
            .join(ex.withColumnRenamed("norm", "en"), "en")
            .groupBy(F.col("dn").alias("norm"))
            .agg(F.expr("min_by(canon, struct(dist, canon, en))")
                 .alias("canon")))

    # (3) cluster the leftovers among themselves; (4) singletons map to
    # themselves via the coalesce in _form_clusters. The canon of a NEW
    # cluster is an ORIGINAL spelling (the smallest raw name whose norm
    # is the cluster label), NOT the normalized form — the same
    # original-spelling contract as surface_form_map ('Acme Corp.'
    # maps to ITSELF, case and punctuation intact); emitting the
    # lowercased/punct-stripped norm here mixed canon domains in the
    # unioned vocabulary and destroyed spellings for every
    # incrementally-admitted entity (code-review r5)
    leftover = rest.join(cand, "norm", "left_anti")
    clustered = _form_clusters(leftover, max_dist, block_cap, prefix_len)
    rep_name = new.groupBy("norm").agg(F.min("name").alias("canon"))
    clustered = (clustered
                 .join(rep_name.withColumnRenamed("norm", "cluster"),
                       "cluster")
                 .select("norm", "canon"))

    norm_map = exact.select("norm", "canon") \
        .unionByName(cand).unionByName(clustered).distinct()
    return new.join(norm_map, "norm").select("name", "canon")


def canonicalize_triples(triples: DataFrame,
                         cols: tuple[str, str] = ("subj", "obj"),
                         max_dist: int = 1, block_cap: int = 200,
                         prefix_len: int = 4) -> DataFrame:
    """Rewrite triple endpoints to their fuzzy-canonical surface forms.

    The post-linking safety net the north rule's "canonicalization of
    surface forms" implies at corpus scale: dictionary linking only
    canonicalizes KNOWN surfaces — typo'd/OCR'd mentions that miss the
    dictionary survive as near-duplicate entities and fragment the
    graph (two node rows, split degrees). This pass builds the endpoint
    vocabulary (subj ∪ obj, mention-weighted), fuzzy-clusters it at the
    vocab grain, and rewrites both endpoint columns via the
    (name → dominant form) map. Endpoints without a fuzzy neighbor map
    to themselves; the triple stream itself is touched only by two
    vocab-sized hash joins (broadcast-able), never shuffled on bodies.
    """
    s, o = cols
    vocab = (triples.groupBy(F.col(s).alias("name")).agg(
        F.count(F.lit(1)).alias("w"))
        .unionByName(triples.groupBy(F.col(o).alias("name")).agg(
            F.count(F.lit(1)).alias("w")))
        .groupBy("name").agg(F.sum("w").alias("w")))
    m = surface_form_map(vocab, name_col="name", weight_col="w",
                         max_dist=max_dist, block_cap=block_cap,
                         prefix_len=prefix_len)
    for side in cols:
        sm = m.select(F.col("name").alias(f"_{side}_n"),
                      F.col("canon").alias(f"_{side}_c"))
        triples = (triples.join(sm, F.col(side) == F.col(f"_{side}_n"),
                                "left")
                   .withColumn(side, F.coalesce(F.col(f"_{side}_c"),
                                                F.col(side)))
                   .drop(f"_{side}_n", f"_{side}_c"))
    return triples
