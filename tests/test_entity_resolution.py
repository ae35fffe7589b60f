"""Entity resolution (operators/entity_resolution.py) and knowledge
fusion (kg_graph.resolve_functional) unit tests: merge semantics,
determinism under repartitioning, block-cap quadratic guard, recency
decay actually changing the outcome, and idempotency on the fixture KG
node vocabulary."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from morra_spark.operators.entity_resolution import (admit_surface_forms,
                                                     canonicalize_triples,
                                                     resolve_entities,
                                                     surface_form_map)
from morra_spark.operators.kg_graph import resolve_functional


def _ents(spark, rows):
    return spark.createDataFrame(rows, "entity_id long, name string")


def _resolved(spark, rows, **kw):
    out = resolve_entities(_ents(spark, rows), **kw).collect()
    return {r.entity_id: r for r in out}


def test_exact_and_fuzzy_merge(spark):
    got = _resolved(spark, [
        (1, "Acme Corp"),           # exact dup of 2 after normalize
        (2, "acme  corp."),
        (3, "Acme Cor"),            # dist 1 from "acme corp"
        (4, "Zebra Systems"),       # unrelated singleton
    ])
    assert got[1].canon_id == got[2].canon_id == got[3].canon_id == 1
    assert got[1].canon_name == "acme cor"  # lexicographic min form
    assert got[1].cluster_size == 3
    assert got[4].canon_id == 4 and got[4].cluster_size == 1


def test_transitive_chain_merges(spark):
    # "alpha xyz" ~ "alpha xy" ~ "alpha x" (dist-1 hops sharing the
    # prefix-4 block) — the endpoints are dist 2 apart, only reachable
    # transitively through the connected-components closure
    got = _resolved(spark, [(1, "alpha xyz"), (2, "alpha xy"),
                            (3, "alpha x")])
    assert got[1].canon_id == got[2].canon_id == got[3].canon_id == 1
    assert got[1].canon_name == "alpha x"
    assert got[1].cluster_size == 3


def test_distance_bound_respected(spark):
    got = _resolved(spark, [(1, "alpha"), (2, "alzzz")])  # dist 3
    assert got[1].canon_id != got[2].canon_id


def test_block_cap_disables_fuzzy_but_not_exact(spark):
    # 12 forms sharing prefix-4 AND head token; cap 10 → no fuzzy pairs
    rows = [(i, f"widget{i}") for i in range(12)]
    rows += [(100, "widget0"), (101, "widget0")]  # exact dups survive
    got = _resolved(spark, rows, block_cap=10)
    assert got[0].canon_id == got[100].canon_id == got[101].canon_id == 0
    assert got[0].cluster_size == 3
    assert got[1].cluster_size == 1  # fuzzy merge suppressed by cap


def test_partitioning_invariance(spark):
    rows = [(i, n) for i, n in enumerate(
        ["red widget", "red widge", "red widgets", "blue bolt",
         "blue  bolt", "BLUE BOLT.", "green gear", "green gea"])]
    base = resolve_entities(_ents(spark, rows)).orderBy("entity_id")
    shuffled = resolve_entities(
        _ents(spark, rows).repartition(7)).orderBy("entity_id")
    assert base.collect() == shuffled.collect()


def test_resolution_idempotent_on_canon_names(spark):
    rows = [(1, "Acme Corp"), (2, "acme cor"), (3, "zebra sys"),
            (4, "zebra syst")]
    first = resolve_entities(_ents(spark, rows))
    canon = (first.select(F.col("canon_id").alias("entity_id"),
                          F.col("canon_name").alias("name"))
             .distinct())
    second = resolve_entities(canon).collect()
    # resolving already-canonical forms is identity... unless two canon
    # forms are themselves near-dups — not the case here by construction
    assert all(r.canon_name == r.name and r.cluster_size == 1
               for r in second)


def test_surface_form_map_picks_dominant_not_smallest(spark):
    # "alice smit" is lexicographically SMALLER but 100x rarer — the
    # weighted representative must be the dominant spelling
    df = spark.createDataFrame(
        [("alice smith", 100), ("alice smit", 1)], "name string, w long")
    m = {r.name: r.canon for r in surface_form_map(
        df, weight_col="w").collect()}
    assert m == {"alice smith": "alice smith",
                 "alice smit": "alice smith"}


def test_surface_form_map_preserves_original_spelling(spark):
    """code-review r5: the representative must be a raw input spelling,
    never the lowercased/punct-stripped normalization — a singleton
    'Acme Corp.' maps to ITSELF, and a cluster folds into the dominant
    ORIGINAL spelling (case intact)."""
    df = spark.createDataFrame(
        [("Acme Corp.", 50),       # singleton cluster, mixed case
         ("Alice Smith", 90),      # dominant spelling of its cluster
         ("alice smith", 5),       # same norm, rarer spelling
         ("alice smit", 1)],       # fuzzy neighbor, typo
        "name string, w long")
    m = {r.name: r.canon for r in surface_form_map(
        df, weight_col="w").collect()}
    assert m == {"Acme Corp.": "Acme Corp.",
                 "Alice Smith": "Alice Smith",
                 "alice smith": "Alice Smith",
                 "alice smit": "Alice Smith"}


def test_canonicalize_triples_restores_typoed_endpoints(spark):
    rows = ([("alice smith", "met", "bob jones")] * 9
            + [("alice smit", "met", "bob jones")]      # typo'd subj
            + [("alice smith", "met", "bob jone")])     # typo'd obj
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = canonicalize_triples(t)
    assert out.count() == 11
    got = out.select("subj", "obj").distinct().collect()
    assert {(r.subj, r.obj) for r in got} == {("alice smith", "bob jones")}


def test_canonicalize_triples_idempotent(spark):
    rows = [("acme corp", "hired", "carol"), ("acme cor", "hired", "dan"),
            ("zebra", "ate", "grass")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    once = canonicalize_triples(t).orderBy("subj", "pred", "obj")
    twice = canonicalize_triples(once).orderBy("subj", "pred", "obj")
    assert once.collect() == twice.collect()


def test_canonicalize_clean_fixture_kg_is_a_noop(spark, fixture_dir):
    """The fixture entity vocabulary has NO two canonical entities
    within edit distance 1 of each other (asserted below, not assumed),
    so fuzzy canonicalization over a clean pipeline run must be an
    exact no-op — the safety net never fires on healthy data."""
    from morra_spark.grammar import Lexicon

    names = sorted(Lexicon().entity_type)
    import numpy as np

    def lev(a, b):
        m = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev = m.copy()
            m[0] = i
            for j, cb in enumerate(b, 1):
                m[j] = min(prev[j] + 1, m[j - 1] + 1,
                           prev[j - 1] + (ca != cb))
        return int(m[-1])

    assert not [(a, b) for i, a in enumerate(names)
                for b in names[i + 1:] if lev(a.lower(), b.lower()) <= 1]

    gold = spark.read.parquet(f"{fixture_dir}/gold_triples") \
        .select("subj", "pred", "obj")
    canon = canonicalize_triples(gold)
    assert (canon.exceptAll(gold).count() == 0
            and gold.exceptAll(canon).count() == 0)


def _map(spark, rows):
    return spark.createDataFrame(rows, "name string, canon string")


def _names(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_admit_exact_and_fuzzy_adopt_frozen_canon(spark):
    existing = _map(spark, [("acme corp", "acme corp"),
                            ("acme cor", "acme corp"),
                            ("zebra sys", "zebra sys")])
    out = {r.name: r.canon for r in admit_surface_forms(
        existing, _names(spark, [
            "ACME Corp.",     # exact after normalize -> adopt
            "acme corpp",     # dist 1 from "acme corp" -> adopt its canon
            "brand new co",   # nothing close -> singleton, self
        ])).collect()}
    assert out == {"ACME Corp.": "acme corp",
                   "acme corpp": "acme corp",
                   "brand new co": "brand new co"}


def test_admit_new_new_forms_cluster_together(spark):
    existing = _map(spark, [("zebra sys", "zebra sys")])
    out = {r.name: r.canon for r in admit_surface_forms(
        existing, _names(spark, ["nova labs", "nova lab"])).collect()}
    # neither matches the frozen vocab; they merge with each other and
    # the lexicographically smallest form is the new canon
    assert out == {"nova labs": "nova lab", "nova lab": "nova lab"}


def test_admit_nearest_match_wins_with_deterministic_ties(spark):
    # "acme coro" is dist 1 from "acme corp" (canon A) and dist 1 from
    # "acme core" (canon B): tie on distance -> smallest canon wins
    existing = _map(spark, [("acme corp", "ca"), ("acme core", "cb")])
    out = {r.name: r.canon for r in admit_surface_forms(
        existing, _names(spark, ["acme coro"])).collect()}
    assert out == {"acme coro": "ca"}


def test_admit_is_idempotent_and_covers_exactly_the_delta(spark):
    existing = _map(spark, [("acme corp", "acme corp")])
    delta = ["acme corpp", "nova labs", "nova lab"]
    first = admit_surface_forms(existing, _names(spark, delta))
    assert {r.name for r in first.collect()} == set(delta)
    # admit the same names again against the grown vocabulary: every
    # one is now an exact hit and the mapping is unchanged
    grown = existing.unionByName(first)
    second = admit_surface_forms(grown, _names(spark, delta))
    assert sorted(first.collect()) == sorted(second.collect())


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_fusion_recency_beats_stale_majority(spark):
    # user 1: 3 stale 'basic' votes (60 days old, weight ~ 3*e^-60/7
    # ~ 0.0006) vs 1 fresh 'pro' vote (weight 1) → pro wins despite
    # losing the raw majority
    rows = ([(1, "basic", _ts(1))] * 3
            + [(1, "pro", dt.datetime(2024, 3, 1))]
            + [(2, "basic", dt.datetime(2024, 3, 1))])  # anchor donor
    df = spark.createDataFrame(
        rows, "user_id long, plan string, ts timestamp")
    out = {r.user_id: r for r in resolve_functional(
        df, subj="user_id", obj="plan").collect()}
    assert out[1].plan == "pro"
    assert out[1].votes == 1
    assert out[1].n_candidates == 2
    assert 0.9 < out[1].support <= 1.0


def test_fusion_tie_breaks_to_smallest_object(spark):
    rows = [(1, "beta", _ts(5)), (1, "alpha", _ts(5))]
    df = spark.createDataFrame(
        rows, "user_id long, plan string, ts timestamp")
    out = resolve_functional(df, subj="user_id", obj="plan").collect()
    assert len(out) == 1 and out[0].plan == "alpha"
    assert out[0].support == pytest.approx(0.5)


def test_fusion_one_row_per_subject_and_support_bounds(spark):
    rows = [(u, t, _ts(1 + (u * 3 + i) % 20))
            for u in range(8) for i, t in enumerate(
                ["a", "b", "a", "c", "b", "a"])]
    df = spark.createDataFrame(
        rows, "user_id long, plan string, ts timestamp")
    out = resolve_functional(df, subj="user_id", obj="plan")
    rows_out = out.collect()
    assert len(rows_out) == 8
    assert all(0.0 < r.support <= 1.0 for r in rows_out)
    # winner's decayed score share must be the max share → >= 1/k
    assert all(r.support >= 1.0 / r.n_candidates for r in rows_out)

def test_admit_new_cluster_preserves_original_spelling(spark):
    """A brand-new admitted entity must keep an ORIGINAL spelling as
    its canon — the surface_form_map contract — not the lowercased,
    punctuation-stripped normalization (code-review r5: the old path
    emitted the norm, mixing canon domains in the unioned vocabulary
    and destroying case for every incrementally-admitted entity)."""
    existing = _map(spark, [("zebra sys", "zebra sys")])
    out = {r.name: r.canon for r in admit_surface_forms(
        existing, _names(spark, ["Nova Labs Inc.", "Nova Labs Inc"]))
        .collect()}
    # both variants normalize to 'nova labs inc', cluster together, and
    # the canon is the smallest RAW spelling — never 'nova labs inc'
    assert set(out.values()) == {"Nova Labs Inc"}
    assert out["Nova Labs Inc."] == "Nova Labs Inc"
