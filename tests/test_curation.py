"""Unit tests for the curation operators (repetition, PII, stratified
sampling, mixture accounting) and fixed-iteration PageRank — the
engine-equivalence check vs DuckDB lives in scripts/oracle_check.py;
these cover edge cases and pure-Python reference parity."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from morra_spark.session import get_spark
    return get_spark("test_curation")


def test_repetition_metrics_flags_and_edges(spark):
    from morra_spark.operators.curation import repetition_metrics

    docs = spark.createDataFrame(
        [(1, "spam ham spam ham spam ham spam ham spam ham"),
         (2, "one two three four five six seven eight nine ten"),
         (3, "word"),
         (4, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    # doc 1: bigrams alternate "spam ham"/"ham spam"; top covers 5/9
    assert out[1].top_bigram_n == 5 and out[1].n_bigrams == 9
    assert out[1].repetitive is True
    assert out[1].dup_word_frac == pytest.approx(1 - 2 / 10)
    # doc 2: all bigrams unique
    assert out[2].top_bigram_n == 1 and out[2].repetitive is False
    assert out[2].dup_word_frac == 0.0
    # doc 3: single word -> no bigrams, not repetitive, no crash
    assert out[3].n_bigrams == 0 and out[3].top_bigram_n == 0
    assert out[3].repetitive is False
    # doc 4: empty text -> split yields [''], 1 word, 0 bigrams
    assert out[4].n_bigrams == 0 and out[4].repetitive is False


def test_pii_scan_finds_exactly_planted(spark):
    from morra_spark.operators.curation import pii_scan, plant_pii

    # ids chosen so 0 gets all three, 7 email only, 11 ip only,
    # 13 phone only, 1 none
    docs = spark.createDataFrame(
        [(i, "clean text here", "s") for i in (0, 1, 7, 11, 13)],
        "doc_id long, text string, source string")
    out = pii_scan(plant_pii(docs)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 5 and r.n_docs_with_pii == 4
    assert r.n_emails == 2 and r.n_ips == 2 and r.n_phones == 2
    # redaction removes chars: every planted artifact is longer than
    # its placeholder
    assert r.chars_removed > 0


def test_pii_redaction_leaves_clean_text_untouched(spark):
    from morra_spark.operators.curation import pii_scan

    docs = spark.createDataFrame(
        [(1, "no personal data in this row at all", "s")],
        "doc_id long, text string, source string")
    r = pii_scan(docs).collect()[0]
    assert r.n_docs_with_pii == 0 and r.chars_removed == 0


def test_stratified_keep_deterministic_and_rate_bounded(spark):
    from morra_spark.operators.curation import stratified_keep

    docs = spark.createDataFrame(
        [(i, "src") for i in range(2000)], "doc_id long, source string")
    kept1 = sorted(r.doc_id for r in
                   stratified_keep(docs, F.lit(250)).collect())
    kept2 = sorted(r.doc_id for r in
                   stratified_keep(docs.repartition(13), F.lit(250))
                   .collect())
    assert kept1 == kept2, "keep decision must not depend on partitioning"
    # md5 buckets are near-uniform: 25% +- a few points on 2000 ids
    assert 0.2 < len(kept1) / 2000 < 0.3
    # rate 1000 keeps everything, rate 0 nothing
    assert stratified_keep(docs, F.lit(1000)).count() == 2000
    assert stratified_keep(docs, F.lit(0)).count() == 0


def test_mixture_tokens_shares_and_epochs(spark):
    from morra_spark.operators.curation import mixture_tokens

    docs = spark.createDataFrame(
        [(1, "a b c d", "en"), (2, "e f", "en"), (3, "x y z w", "zh")],
        "doc_id long, text string, lang string")
    out = {r.lang: r for r in
           mixture_tokens(docs, {"en": 0.6, "zh": 0.4}, 100).collect()}
    assert out["en"].n_tokens == 6 and out["zh"].n_tokens == 4
    assert out["en"].corpus_share == 0.6 and out["zh"].corpus_share == 0.4
    assert out["en"].epochs == 10.0   # 100*0.6/6
    assert out["zh"].epochs == 10.0   # 100*0.4/4


def _pagerank_reference(edges, iters=3, d=0.85):
    """Pure-Python synchronous PageRank on the symmetrized graph."""
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = sorted({a for a, _ in sym})
    deg = {a: sum(1 for x, _ in sym if x == a) for a in nodes}
    n = len(nodes)
    pr = {a: 1.0 / n for a in nodes}
    for _ in range(iters):
        new = {}
        for b in nodes:
            mass = sum(pr[a] / deg[a] for a, bb in sym if bb == b)
            new[b] = (1 - d) / n + d * mass
        pr = new
    return pr


def test_pagerank_matches_python_reference(spark):
    from morra_spark.operators.components import pagerank_fixed

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pr for r in pagerank_fixed(df).collect()}
    want = _pagerank_reference(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-5)
    # total mass conserved (no dangling nodes on a symmetrized graph)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_pagerank_hub_outranks_leaf(spark):
    from morra_spark.operators.components import pagerank_fixed

    # star: node 0 connected to 1..5 — hub must dominate
    df = spark.createDataFrame([(0, i) for i in range(1, 6)],
                               "src long, dst long")
    got = {r.node: r.pr for r in pagerank_fixed(df).collect()}
    assert got[0] > max(got[i] for i in range(1, 6)) * 2


def test_curation_funnel_partitions_corpus(spark):
    """The funnel stages must PARTITION the (doubled) corpus: every doc
    lands in exactly one stage, totals reconcile, and each dedup stage
    provably fires on a hand-built corpus."""
    import __spark_entry__ as E

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat of a red house today"),   # kept
         (2, "the cat sat on the mat of a red house today"),   # exact dup of 1
         (3, "the cat sat on the mat of a red house now"),     # near dup of 1
         (4, "zz yy xx ww vv uu tt ss rr qq"),                 # low_en
         (5, "too short")],                                    # too_short
        "doc_id long, text string, source string".replace(
            ", source string", ""))
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r.stage: r for r in
               E.q_curation_funnel(spark, d).collect()}
    # doubled corpus: 10 docs total across all stages
    assert sum(r.n_docs for r in out.values()) == 10
    # every original quality-passer's shifted twin dies at exact dedup:
    # passers are docs 1,2,3 (x2) -> 6; shifted 1',2',3' are exact dups
    # of {1,2,3}, and doc 2 itself duplicates doc 1 -> 4 exact_dup
    assert out["exact_dup"].n_docs == 4
    # near-dup: doc 3 clusters with doc 1 (9/11 shared shingle Jaccard)
    assert out["near_dup"].n_docs == 1
    assert out["kept"].n_docs == 1
    assert out["too_short"].n_docs == 2 and out["low_en"].n_docs == 2
    # token accounting: sum over stages == total tokens of doubled corpus
    total = sum(r.n_tokens for r in out.values())
    assert total == 2 * (11 + 11 + 11 + 10 + 2)


def test_contamination_report_exact_overlap(spark):
    from morra_spark.operators.curation import contamination_report

    ev = spark.createDataFrame(
        [(100, "q w e r t y u i o p", "eval")],
        "doc_id long, text string, source string")
    train = spark.createDataFrame(
        [(1, "x q w e r t y u i o z", "s"),   # contains eval 8-gram q..i
         (2, "totally different words here none shared with anything at all", "s"),
         (3, "q w e r t y u z", "s")],        # only a 7-gram prefix -> clean
        "doc_id long, text string, source string")
    r = contamination_report(train, ev, n=8).collect()[0]
    assert r.n_docs == 3 and r.n_contaminated == 1
    assert r.contamination_rate == pytest.approx(1 / 3, abs=1e-4)


def test_pack_sequences_offsets_and_straddle(spark):
    from morra_spark.operators.curation import pack_sequences

    # stream s: 3 + 4 + 5 tokens, ctx=8 -> doc 3 starts at 7, ends 12:
    # straddles the chunk-0/1 boundary; doc 1,2 fit in chunk 0
    docs = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "d e f g", "s"), (3, "h i j k l", "s"),
         (4, "", "t")],                        # empty text -> 0 tokens
        "doc_id long, text string, source string")
    out = {r.doc_id: r for r in pack_sequences(docs, ctx_len=8).collect()}
    assert (out[1].start_off, out[1].end_off, out[1].chunk_id,
            out[1].straddles) == (0, 3, 0, False)
    assert (out[2].start_off, out[2].end_off) == (3, 7)
    assert out[3].chunk_id == 0 and out[3].straddles is True
    assert out[4].n_tok == 0 and out[4].straddles is False


def test_vocab_coverage_top1(spark):
    from morra_spark.operators.curation import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "the the the cat", "en"), (2, "the dog", "en")],
        "doc_id long, text string, lang string")
    r = vocab_coverage(docs, top_k=1).collect()[0]
    # 6 tokens, 'the' x4 -> coverage 4/6
    assert r.n_vocab == 3 and r.n_tokens == 6 and r.top_k_tokens == 4
    assert r.coverage == pytest.approx(4 / 6, abs=1e-4)


def test_unigram_lm_score_hand_computed(spark):
    from morra_spark.operators.curation import unigram_lm_score
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    # freq: a=2 b=2 c=1; N=5 V=3; p_add1(a)=p(b)=3/8, p(c)=2/8
    out = {r.doc_id: r for r in unigram_lm_score(docs).collect()}
    assert out[1].n_tokens == 3
    assert out[1].bits_per_token == pytest.approx(
        math.log2(8 / 3), abs=1e-4)
    assert out[2].bits_per_token == pytest.approx(
        (math.log2(8 / 3) + math.log2(4)) / 2, abs=1e-4)


def test_tfidf_keywords_hand_computed(spark):
    from morra_spark.operators.curation import tfidf_keywords
    import math

    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y z")], "doc_id long, text string")
    rows = tfidf_keywords(docs, top_k=2).collect()
    got = {(r.doc_id, r.rnk): (r.word, r.score) for r in rows}
    # df: x=1 y=2 z=1; D=2; idf(x)=idf(z)=ln(3/2), idf(y)=ln(1)=0
    assert got[(1, 1)][0] == "x"
    assert got[(1, 1)][1] == pytest.approx(
        round(2 * math.log(3 / 2), 4), abs=1e-6)
    assert got[(1, 2)] == ("y", 0.0)
    assert got[(2, 1)][0] == "z" and got[(2, 2)][0] == ("y")


def test_run_curation_materializes_survivors_and_report(spark, tmp_path):
    """The curate runner's survivor parquet and report must reconcile:
    stages partition the corpus, survivors == 'kept' rows, and known
    docs land in known stages."""
    from morra_spark.plans.curate import run_curation

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat of a red house today"),
         (2, "the cat sat on the mat of a red house today"),   # exact dup
         (3, "the cat sat on the mat of a red house now"),     # near dup
         (4, "zz yy xx ww vv uu tt ss rr qq"),                 # low_en
         (5, "too short")],                                    # too_short
        "doc_id long, text string")
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    rep = run_curation(spark, docs_path=src, out_dir=str(tmp_path / "o"))
    assert rep == {"kept": (1, 11), "exact_dup": (1, 11),
                   "near_dup": (1, 11), "low_en": (1, 10),
                   "too_short": (1, 2)}
    surv = spark.read.parquet(str(tmp_path / "o" / "survivors"))
    assert [r.doc_id for r in surv.collect()] == [1]
    rdf = spark.read.parquet(str(tmp_path / "o" / "report"))
    assert rdf.agg(F.sum("n_docs")).collect()[0][0] == 5


def test_bpe_merge_pairs_hand_counted(spark):
    from morra_spark.operators.curation import bpe_merge_pairs

    # vocab: "aab" x2 docs-worth, "ab" x1; pairs per occurrence:
    #   aab -> ("a a", "a b"), ab -> ("a b")
    # freq(aab)=3 (appears 3 times), freq(ab)=2
    docs = spark.createDataFrame(
        [(1, "aab ab aab"), (2, "aab ab")], "doc_id long, text string")
    out = {r.pair: r.n for r in bpe_merge_pairs(docs, top_k=10).collect()}
    assert out == {"a a": 3, "a b": 5}


def test_bpe_merge_pairs_single_char_words_and_ties(spark):
    from morra_spark.operators.curation import bpe_merge_pairs

    # single-char words contribute no pairs; tie broken pair-asc
    docs = spark.createDataFrame(
        [(1, "x y z xy yz")], "doc_id long, text string")
    rows = bpe_merge_pairs(docs, top_k=1).collect()
    assert len(rows) == 1 and rows[0].pair == "x y" and rows[0].n == 1


def test_adaptive_length_bounds_flags_outliers_per_lang(spark):
    from morra_spark.operators.curation import adaptive_length_bounds

    # en: 19 docs of 10 tokens + 1 of 1000 -> the 1000er is above p95;
    # zh: uniform 3 tokens -> everything kept (lo == hi == 3)
    rows = [(i, "en", " ".join(["w"] * 10)) for i in range(19)]
    rows.append((19, "en", " ".join(["w"] * 1000)))
    rows += [(100 + i, "zh", "一 二 三") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r for r in adaptive_length_bounds(docs).collect()}
    assert out[19].keep is False and out[19].n_tokens == 1000
    assert all(out[i].keep for i in range(19))
    assert all(out[100 + i].keep for i in range(5))
    assert out[100].lo == 3.0 and out[100].hi == 3.0


def test_split_assign_deterministic_and_partition_invariant(spark):
    from morra_spark.operators.curation import split_assign

    docs = spark.createDataFrame(
        [(i, "en") for i in range(1000)], "doc_id long, lang string")
    a = {r.doc_id: r.split for r in split_assign(docs).collect()}
    b = {r.doc_id: r.split
         for r in split_assign(docs.repartition(17)).collect()}
    assert a == b  # same assignment on any partitioning
    frac = {s: sum(1 for v in a.values() if v == s) / 1000
            for s in ("train", "val", "test")}
    assert 0.75 < frac["train"] < 0.85
    assert 0.07 < frac["val"] < 0.13 and 0.07 < frac["test"] < 0.13


def test_char_entropy_hand_computed(spark):
    from morra_spark.operators.curation import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert out[1].entropy_bits == 0.0 and out[1].low_entropy is True
    assert out[2].entropy_bits == 1.0 and out[2].low_entropy is True
    assert out[3].entropy_bits == 2.0 and out[3].low_entropy is False
    assert 4 not in out  # empty docs excluded, not fabricated


def test_triangle_count_k4_pendant_and_noise_edges(spark):
    from morra_spark.operators.components import triangle_count

    # K4 on {1,2,3,4} (4 triangles, each node in 3), pendant 5-1,
    # plus a self-loop, a duplicate, and a reversed edge to exercise
    # canonicalization
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (5, 1), (2, 1), (3, 3), (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_count_star_has_none(spark):
    from morra_spark.operators.components import triangle_count

    df = spark.createDataFrame([(0, i) for i in range(1, 6)],
                               "src long, dst long")
    out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert set(out) == set(range(6)) and all(v == 0 for v in out.values())


def test_snapshot_diff_labels_all_four_statuses(spark):
    from morra_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")],
        "doc_id long, text string")
    out = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_evolve_corpus_plants_expected_churn(spark):
    from morra_spark.operators.snapshot import evolve_corpus, snapshot_diff

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string")
    out = {r.doc_id: r.status
           for r in snapshot_diff(docs, evolve_corpus(docs)).collect()}
    assert out[7] == "removed" and out[14] == "removed"
    assert out[5] == "changed" and out[25] == "changed"
    assert out[100000] == "added" and out[100011] == "added"
    assert out[35] == "removed"  # %7 dominates %5: dropped before mutate
    assert out[1] == "unchanged"


def test_quality_tiers_monotonic_and_balanced(spark):
    from morra_spark.operators.curation import quality_tiers

    rows = [(i, "en", "common common common") for i in range(6)]
    rows += [(10 + i, "en", f"rare{i} unique{i} single{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = quality_tiers(docs, tiers=4).collect()
    # tiers must be monotone in (score, doc_id) order and balanced
    ordered = sorted(out, key=lambda r: (r.bits_per_token, r.doc_id))
    tiers = [r.tier for r in ordered]
    assert tiers == sorted(tiers) and set(tiers) == {1, 2, 3, 4}
    sizes = [tiers.count(t) for t in (1, 2, 3, 4)]
    assert max(sizes) - min(sizes) <= 1
    # the repetitive common-word docs compress better -> lower bits
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].bits_per_token < by_id[10].bits_per_token


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from morra_spark.operators.curation import weighted_sample

    docs = spark.createDataFrame(
        [(i, 1.0 if i else 1e9) for i in range(100)],
        "doc_id long, w double")
    a = [r.doc_id for r in
         weighted_sample(docs, k=10, weight=F.col("w")).collect()]
    b = [r.doc_id for r in
         weighted_sample(docs.repartition(13), k=10,
                         weight=F.col("w")).collect()]
    assert a == b  # partitioning-invariant selection
    assert a[0] == 0  # the 10^9-weight doc always wins rank 1
    assert len(a) == 10 and len(set(a)) == 10  # without replacement


def test_weighted_sample_k_exceeding_n_returns_all(spark):
    from morra_spark.operators.curation import weighted_sample

    docs = spark.createDataFrame([(i, 2.0) for i in range(5)],
                                 "doc_id long, w double")
    out = weighted_sample(docs, k=50, weight=F.col("w")).collect()
    assert sorted(r.doc_id for r in out) == [0, 1, 2, 3, 4]


def test_triangle_count_matches_bruteforce_random_graphs(spark):
    import itertools
    import random

    from morra_spark.operators.components import triangle_count

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 10
        edges = [(a, b) for a in range(n) for b in range(a + 1, n)
                 if rng.random() < 0.4]
        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        tri = {i: 0 for i in range(n)}
        for a, b, c in itertools.combinations(range(n), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
        expected = {i: tri[i] for i in range(n) if adj[i]}
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r.node: r.n_triangles for r in triangle_count(df).collect()}
        assert out == expected, f"seed={seed}"


def test_char_entropy_matches_python_reference(spark):
    import math
    import random
    from collections import Counter

    from morra_spark.operators.curation import char_entropy

    rng = random.Random(7)
    texts = ["".join(rng.choice("abcdef ") for _ in range(rng.randint(1, 60)))
             for _ in range(30)]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    out = {r.doc_id: r.entropy_bits for r in char_entropy(docs).collect()}
    for i, t in enumerate(texts):
        c = Counter(t)
        h = -sum((v / len(t)) * math.log2(v / len(t)) for v in c.values())
        assert out[i] == pytest.approx(round(h, 4), abs=2e-4)


def test_weighted_sample_matches_python_reference(spark):
    import hashlib
    import math

    from morra_spark.operators.curation import weighted_sample

    docs = [(i, float(1 + (i * 37) % 11)) for i in range(200)]

    def key(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(1 << 60)
        return round(-math.log(u) / w, 8)

    expect = [i for i, w in sorted(docs, key=lambda d: (key(*d), d[0]))[:20]]
    df = spark.createDataFrame(docs, "doc_id long, w double")
    got = [r.doc_id for r in
           weighted_sample(df, 20, F.col("w")).collect()]
    assert got == expect


def test_label_documents_optional_gates(spark, tmp_path):
    from morra_spark.plans.curate import run_curation

    def good(i: int) -> str:
        # distinct content words per doc so the near-dup stage can't
        # collapse the keepers; stopword ratio stays above low_en's 5%
        return (f"the u{i}a u{i}b of and a u{i}c u{i}d u{i}e u{i}f"
                f" u{i}g u{i}h extra")

    rows = [(i, good(i), "en", "s0", 60) for i in range(8)]
    # low entropy, passes base gates; stopword tail ordered "the and of
    # a" so it shares NO trigram with the keepers (its distinct-trigram
    # set is tiny, so one shared trigram would exceed the 0.05 Jaccard
    # and bridge every keeper into one near-dup component)
    rows.append((50, "aa aa aa aa aa aa aa aa aa the and of a x", "en",
                 "s0", 41))
    # len outlier: padded with stopword-rich text so the base low_en
    # gate does NOT fire first and the length gate is what drops it
    rows.append((51, good(99) + " the pad" * 150, "en", "s0", 999))
    schema = ("doc_id long, text string, lang string, source string,"
              " n_chars long")
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    rep = run_curation(spark, docs_path=src, out_dir=str(tmp_path / "o1"),
                       entropy_min=2.5, adaptive_length=True)
    assert rep["low_entropy"][0] == 1
    assert rep["len_outlier"][0] == 1
    assert rep["kept"][0] == 8
    # gates off (defaults): both docs fall through to the base funnel
    rep0 = run_curation(spark, docs_path=src, out_dir=str(tmp_path / "o0"))
    assert "low_entropy" not in rep0 and "len_outlier" not in rep0
    assert rep0["kept"][0] == 10


def test_bpe_merge_pairs_matches_python_reference(spark):
    import random
    from collections import Counter

    from morra_spark.operators.curation import bpe_merge_pairs

    rng = random.Random(11)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
             for _ in range(200)]
    text = " ".join(words)
    ref = Counter()
    for w, freq in Counter(words).items():
        for i in range(len(w) - 1):
            ref[f"{w[i]} {w[i + 1]}"] += freq
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [(r.pair, r.n) for r in bpe_merge_pairs(docs, top_k=15).collect()]
    assert got == expect


def test_vocab_encode_roundtrip_and_oov(spark):
    from morra_spark.operators.curation import build_vocab, encode_tokens

    docs = spark.createDataFrame(
        [(1, "b a b c rare"), (2, "a b a")], "doc_id long, text string")
    vocab = {r.word: r.token_id
             for r in build_vocab(docs, size=3).collect()}
    # counts: b=4 a=4 c=1 rare=1 -> ranked (a,b by word asc at tie), c
    assert vocab == {"a": 0, "b": 1, "c": 2}
    enc = encode_tokens(docs, build_vocab(docs, size=3))
    got = {(r.doc_id, r.pos): r.token_id for r in enc.collect()}
    assert got[(1, 0)] == 1 and got[(1, 1)] == 0
    assert got[(1, 4)] == -1            # 'rare' is OOV
    assert got[(2, 0)] == 0 and got[(2, 2)] == 0
    # sequence reassembles in full
    assert sorted(p for d, p in got if d == 1) == [0, 1, 2, 3, 4]


def test_pmi_collocations_hand_computed(spark):
    import math

    from morra_spark.operators.search import pmi_collocations

    # "x y" always together (5x); "a" and "b" frequent but independent
    text = " ".join(["x y"] * 5 + ["a b", "b a", "a c", "b c", "c a",
                                   "c b", "a b", "b a"])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = {r.pair: r for r in
           pmi_collocations(docs, min_count=5, top_k=5).collect()}
    assert "x y" in out and out["x y"].n == 5
    # hand NPMI for "x y": tokens=26, bigram slots=25, c(x)=c(y)=5
    p_ab, p_a = 5 / 25, 5 / 26
    npmi = math.log(p_ab / (p_a * p_a)) / -math.log(p_ab)
    assert out["x y"].npmi == pytest.approx(round(npmi, 4))
    # the exclusive pair outranks any independent pair present
    for pair, r in out.items():
        if pair != "x y":
            assert r.npmi < out["x y"].npmi


def test_mixture_rebalance_binding_source_and_determinism(spark):
    from morra_spark.operators.curation import mixture_rebalance

    # src_a: 100 docs x 10 tokens = 1000; src_b: 100 x 30 = 3000;
    # src_c: 50 x 10 = 500 (share 0 -> dropped entirely).
    # targets a=0.5, b=0.5: budget = min(1000/0.5, 3000/0.5) = 2000
    # -> a keeps 1000/1000 tokens (p=1000, the binding source),
    #    b keeps 1000/3000 (p=333)
    rows = ([(i, "src_a", " ".join(["w"] * 10)) for i in range(100)]
            + [(1000 + i, "src_b", " ".join(["w"] * 30))
               for i in range(100)]
            + [(2000 + i, "src_c", " ".join(["w"] * 10))
               for i in range(50)])
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    out = {r.source: r
           for r in mixture_rebalance(
               docs, {"src_a": 0.5, "src_b": 0.5}).collect()}
    assert out["src_a"].p_keep_permille == 1000
    assert out["src_a"].n_docs_kept == 100          # binding: keeps all
    assert out["src_a"].n_tokens_kept == 1000
    assert out["src_b"].p_keep_permille == 333
    assert out["src_b"].n_tokens_kept <= 1500       # ~1000 expected
    assert out["src_c"].p_keep_permille == 0
    assert out["src_c"].n_docs_kept == 0 and out["src_c"].n_tokens_kept == 0
    # deterministic under repartitioning (portable-md5 decision)
    again = {r.source: r.n_docs_kept
             for r in mixture_rebalance(
                 docs.repartition(13),
                 {"src_a": 0.5, "src_b": 0.5}).collect()}
    assert again == {s: r.n_docs_kept for s, r in out.items()}
    # zero-token source must not divide by zero in the rate
    empty = docs.unionByName(spark.createDataFrame(
        [(9000, "src_empty", "   ")], "doc_id long, source string, text string"))
    oute = {r.source: r for r in mixture_rebalance(
        empty, {"src_a": 0.5, "src_b": 0.3, "src_empty": 0.2}).collect()}
    assert oute["src_empty"].p_keep_permille == 0
    assert oute["src_empty"].n_docs_kept == 0
    # and the empty source is the binding one: a 0.2 share nobody can
    # fill caps the downsample-only budget at zero — the honest answer
    assert all(r.p_keep_permille == 0 for r in oute.values())


def test_mixture_rebalance_reports_absent_target_source(spark):
    """code-review r5: a target source with NO corpus rows must appear
    in the report (zero tokens, zero keeps) and bind the budget to 0 —
    the old CASE-expression share dropped it silently, so the report
    looked like the target mixture was achieved."""
    from morra_spark.operators.curation import mixture_rebalance

    docs = spark.createDataFrame(
        [(i, "web", "some web text here") for i in range(20)],
        "doc_id long, source string, text string")
    out = {r.source: r for r in mixture_rebalance(
        docs, {"web": 0.5, "code": 0.5}).collect()}
    assert set(out) == {"web", "code"}           # absent source reported
    assert out["code"].n_tokens_before == 0
    assert out["code"].target_share == 0.5
    # downsample-only cannot mint 'code' tokens: budget 0, nothing kept
    assert all(r.p_keep_permille == 0 and r.n_tokens_kept == 0
               for r in out.values())


def test_split_leakage_counts_cross_split_pairs(spark):
    from morra_spark.operators.curation import mixture_rebalance  # noqa: F401
    from morra_spark.operators.curation import _portable_bucket, split_leakage
    from pyspark.sql import functions as F

    # find doc_ids landing in each split under the real md5 rule, then
    # plant one duplicate text across (2 train, 1 val, 1 test) and a
    # unique text everywhere else -> pairs: train-val 2, train-test 2,
    # val-test 1; one leaked fingerprint per split pair
    ids = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    by_split = {r.split: r.ids for r in ids.select(
        "doc_id", _portable_bucket(F.col("doc_id")).alias("b"))
        .withColumn("split", F.when(F.col("b") < 800, "train")
                    .when(F.col("b") < 900, "val").otherwise("test"))
        .groupBy("split").agg(F.collect_list("doc_id").alias("ids"))
        .collect()}
    dup_ids = (sorted(by_split["train"])[:2] + sorted(by_split["val"])[:1]
               + sorted(by_split["test"])[:1])
    uniq_ids = sorted(by_split["train"])[2:6]
    rows = [(int(i), "THE SAME, Document!") for i in dup_ids] \
        + [(int(i), f"unique text number {i}") for i in uniq_ids]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.split_a, r.split_b): r for r in split_leakage(docs).collect()}
    assert out[("train", "val")].n_dup_pairs == 2
    assert out[("test", "train")].n_dup_pairs == 2
    assert out[("test", "val")].n_dup_pairs == 1
    assert all(r.n_leaked_fps == 1 for r in out.values())
    # normalization bridges case/punct variants across splits
    docs2 = spark.createDataFrame(
        [(int(dup_ids[0]), "the same document"),
         (int(dup_ids[2]), "THE SAME?? DOCUMENT!!")],
        "doc_id long, text string")
    out2 = split_leakage(docs2).collect()
    assert len(out2) == 1 and out2[0].n_dup_pairs == 1


def test_chunk_documents_overlap_and_edges(spark):
    from morra_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),  # 10 tokens
         (2, "a b"),                              # shorter than one chunk
         (3, "")],                                # empty -> no chunks
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    got = {(r.doc_id, r.chunk_idx): r for r in out}
    # step 3 -> starts 0,3,6: consecutive chunks share exactly 1 token.
    # A start at 9 would be a pure-overlap chunk ("t10", fully inside
    # chunk 2) — never generated (code-review r5)
    assert got[(1, 0)].chunk_text == "t1 t2 t3 t4"
    assert got[(1, 1)].chunk_text == "t4 t5 t6 t7"
    assert got[(1, 2)].chunk_text == "t7 t8 t9 t10"
    assert (1, 3) not in got
    assert got[(2, 0)].chunk_text == "a b" and got[(2, 0)].chunk_len == 2
    assert not any(d == 3 for d, _ in got)
    # every token of every doc appears in at least one chunk
    assert sum(r.chunk_len for r in out if r.doc_id == 1) >= 10
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_chunk_documents_no_pure_overlap_trailing_chunk(spark):
    """code-review r5: a doc one token short of a single chunk used to
    emit a second chunk that was a strict subset of the first — a
    duplicate fed straight to the embed/index stage. The non-subset
    trailing chunk one token later must still be emitted."""
    from morra_spark.operators.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(57))),   # covered by chunk 0
         (2, " ".join(f"w{i}" for i in range(65)))],  # genuine tail chunk
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_len == 57
    assert len(by_doc[2]) == 2
    tail = next(r for r in by_doc[2] if r.chunk_idx == 1)
    assert tail.chunk_len == 9 and tail.chunk_text.endswith("w64")


def test_khop_reach_path_graph_true_distances(spark):
    from morra_spark.operators.components import khop_reach

    # path a-b-c-d-e, seed a, k=2: only a(0), b(1), c(2); d, e absent
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r.hops for r in khop_reach(edges, seeds, k=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_khop_reach_multi_seed_takes_min_distance(spark):
    from morra_spark.operators.components import khop_reach

    # same path, seeds {a, e}: c is 2 hops from both; d claims hop 1
    # from e even though it is 3 from a — min over seeds wins
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("e",)], "node string")
    out = {r.node: r.hops for r in khop_reach(edges, seeds, k=2).collect()}
    assert out == {"a": 0, "e": 0, "b": 1, "d": 1, "c": 2}


def test_khop_reach_ignores_edge_direction_and_duplicates(spark):
    from morra_spark.operators.components import khop_reach

    edges = spark.createDataFrame(
        [("b", "a"), ("b", "a"), ("a", "b"), ("c", "b")],
        "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r.hops for r in khop_reach(edges, seeds, k=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}
