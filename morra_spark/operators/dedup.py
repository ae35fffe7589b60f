"""Large-scale deduplication operators for training-data pipelines.

Exact dedup is a plain hash-groupBy; near-dup uses the standard
MinHash+LSH recipe (shingle → k min-hashes → band → bucket self-join) and
SimHash. Everything is built-in ``pyspark.sql.functions`` — the hashing,
banding, and bucket joins all run JVM-side inside whole-stage codegen;
there is no Python in the hot path at all, so these scale to the 100 TB
tier limited only by the shuffle on (band_id, band_hash) /
(prefix bucket), both of which are high-cardinality and skew-free by
construction (hash-distributed keys).

Exact n-gram-Jaccard verification of the LSH candidates is
``verify_lsh_candidates`` (cost bounded by the candidate pairs); the
standalone inverted-index form — with a shingle document-frequency cap
against hot-shingle blowup — is ``ngram_jaccard_pairs`` (SQL-expressible,
oracle-checked through ``__spark_entry__.q_dedup_ngram_jaccard``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_text_fp(col: F.Column) -> F.Column:
    """32-byte md5 of the case/punctuation-normalized text — THE
    normalized-exact duplicate key, shared by ``normalized_dup_groups``,
    ``dedup_survivorship`` and ``curation.split_leakage`` so the three
    audits can never drift apart (code-review r5 deduplicated three
    inlined copies). Normalization = ``entity_resolution.normalize_name``
    (lower, strip non-alnum, collapse/trim whitespace; ASCII-safe, so
    the DuckDB oracles replay it codepoint-for-codepoint)."""
    from morra_spark.operators.entity_resolution import normalize_name

    return F.md5(normalize_name(col))


def _word_shingles(df: DataFrame, text_col: str = "text", n: int = 3):
    """(doc_id, tri) distinct word-n-gram shingles, built-ins only.

    ``words`` is projected as a real column BEFORE the higher-order
    lambda: expressions referenced inside ``transform`` lambdas are not
    common-subexpression-eliminated, so an inline ``split()`` would re-split
    the text once per element access (O(len²) per doc).

    Documents shorter than ``n`` words emit NO shingles: the index domain
    is gated on ``size(words) >= n`` so ``element_at`` never reads past the
    array end (Spark 4 ANSI mode turns that into a job-aborting
    INVALID_ARRAY_INDEX instead of a null).
    """
    words_df = df.select(
        "doc_id", F.split(F.trim(F.col(text_col)), " ").alias("words"))
    w = F.col("words")
    idxs = F.when(F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)) \
        .otherwise(F.array().cast("array<int>"))
    tris = F.transform(
        idxs,
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j + 1) for j in range(n)]))
    return words_df.select("doc_id", F.explode(tris).alias("tri")).distinct()


def _portable_hash60(col):
    """Engine-portable 60-bit hash: the decimal value of the first 15 hex
    chars of md5. Slower than xxhash64 (the default fast path) but
    bit-identical in ANY engine with md5 — the ``portable=True`` variants
    use it so the DuckDB oracle can replay the exact algorithm and the
    driver gate upgrades these operators from rows-only to value-hashed.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(docs: DataFrame, num_hashes: int = 32,
                       portable: bool = False) -> DataFrame:
    """(doc_id, sig: array<long>) — k independent min-hashes per doc.

    Each hash family is ``xxhash64(seed_i, shingle)`` (or the portable
    md5-based family); the k families are evaluated as k parallel MIN
    aggregates over the shingle rows in ONE partial-aggregating groupBy.
    An explode-the-seed-domain form was used first and measured strictly
    worse: it multiplies the pre-shuffle row count by k (32×) and needs
    a second groupBy to re-assemble the signature array, for identical
    results.
    """
    grams = _word_shingles(docs)
    if portable:
        hs = [_portable_hash60(F.concat(F.lit(f"{i}:"), F.col("tri")))
              for i in range(num_hashes)]
    else:
        hs = [F.xxhash64(F.lit(i), F.col("tri")) for i in range(num_hashes)]
    return (grams.groupBy("doc_id")
            .agg(*[F.min(h).alias(f"h{i}") for i, h in enumerate(hs)])
            .select("doc_id", F.array(*[F.col(f"h{i}")
                                        for i in range(num_hashes)])
                    .alias("sig")))


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 32,
                      bands: int = 8, portable: bool = False) -> DataFrame:
    """Candidate near-duplicate pairs (da, db, n_shared_bands).

    Signature is cut into ``bands`` bands of r = k/bands rows; docs
    sharing any band-hash land in one bucket; buckets self-join into
    pairs. Shuffle keys are (band_id, band_hash) — uniformly distributed,
    so the self-join never sees a hot key unless actual mass-duplicates
    exist (which is exactly the output).

    ``portable=True`` uses the md5 hash family and the band's raw
    value-string as the bucket key (exact equality, no re-hash), making
    the whole cascade replayable in DuckDB.
    """
    r = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, portable=portable)
    band_slice = F.slice("sig", F.col("band_id") * r + 1, r)
    band_key = (F.concat_ws(",", F.transform(band_slice,
                                             lambda x: x.cast("string")))
                if portable else F.xxhash64(band_slice))
    banded = (sig.withColumn(
        "band_id", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .withColumn("band_hash", band_key)
        .select("doc_id", "band_id", "band_hash"))
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
                   & (F.col("a.band_hash") == F.col("b.band_hash"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
            .orderBy("da", "db"))


def verify_lsh_candidates(pairs: DataFrame, docs: DataFrame, n: int = 3,
                          threshold: float = 0.0) -> DataFrame:
    """Exact word-n-gram Jaccard scores for LSH candidate pairs ONLY.

    The production cascade is ``minhash_lsh_pairs`` → this: shingles are
    computed just for docs that appear in a candidate pair (semi-join),
    then each pair's intersection is assembled by routing the left doc's
    shingles through the pair list and matching the right doc's shingles
    on (db, tri) — every intermediate is bounded by |candidate pairs| ×
    |shingles per doc|, never by the corpus-wide inverted index, so no
    hot-shingle quadratic blowup is possible here regardless of how
    common any shingle is.

    Returns (da, db, jaccard ≥ threshold). Candidate pairs sharing no
    shingle at all (possible via band-hash collisions) drop out (their
    Jaccard is 0).
    """
    p = pairs.select("da", "db")
    cand_docs = (p.select(F.col("da").alias("doc_id"))
                 .unionByName(p.select(F.col("db").alias("doc_id")))
                 .distinct())
    g = _word_shingles(docs, n=n).join(cand_docs, "doc_id", "left_semi")
    sizes = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    ga = g.select(F.col("doc_id").alias("da"), "tri")
    gb = g.select(F.col("doc_id").alias("db"), "tri")
    inter = (p.join(ga, "da")
             .join(gb, ["db", "tri"])
             .groupBy("da", "db")
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    return (inter.join(sa, "da").join(sb, "db")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("da", "db", "jaccard"))


def simhash_signatures(docs: DataFrame, bits: int = 32,
                       portable: bool = False) -> DataFrame:
    """(doc_id, simhash, prefix16) — SimHash over word hashes.

    Per bit j: sum of ±1 contributions of each distinct word's hash bit,
    sign becomes bit j of the signature. The 2·bits aggregations are one
    hash-aggregate stage; prefix16 is the coarse near-dup bucket key.
    """
    words = (docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("text")), " "))).alias("w"))
        .withColumn("h", _portable_hash60(F.col("w")) if portable
                    else F.xxhash64("w")))
    bit_sums = [
        F.sum(F.when(F.shiftrightunsigned(F.col("h"), j).bitwiseAND(1) == 1,
                     1).otherwise(-1)).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = words.groupBy("doc_id").agg(*bit_sums)
    sim = agg.select(
        "doc_id",
        sum([F.when(F.col(f"b{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
             for j in range(bits)], F.lit(0).cast("long")).alias("simhash"))
    return (sim.withColumn(
        "prefix16", F.shiftrightunsigned(F.col("simhash"), bits - 16))
        .orderBy("doc_id"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3,
                        min_jaccard: float = 0.05,
                        df_cap: int = 100) -> DataFrame:
    """Standalone near-dup candidates: word-n-gram Jaccard via an
    inverted index with a shingle document-frequency cap (shingles
    shared by more than ``df_cap`` docs are dropped — a ubiquitous
    shingle is a quadratic hot key; the cap bounds each index entry's
    fan-out). The cap is computed with a partial-aggregating groupBy,
    NOT a count-over-window, so the hot shingle's own rows reduce
    map-side before any shuffle.

    Pair generation is collect-list + in-row combinations, NOT a
    self-join: each kept shingle's sorted doc list (≤ ``df_cap``
    elements by construction — the cap filter runs BEFORE collect, so
    no unbounded aggregation buffer) expands to its C(d,2) pairs with
    JVM array lambdas. One shuffle on ``tri`` instead of the self-join's
    three, and the shingle explode runs ONCE (localCheckpoint; the old
    self-join recomputed it per branch — measured 4× the scan cost at
    sf0.1).

    Returns (da, db, jaccard) with da < db and jaccard >= min_jaccard.
    The LSH-pruned alternative (exact scores for MinHash candidates
    only) is ``verify_lsh_candidates``.
    """
    # eager=True, deliberately: a LAZY checkpoint here materializes only
    # after this function returns, when `raw`'s Python wrapper is gone —
    # py4j detaches its JVM Dataset, the SQL-metric accumulators (weakly
    # held in AccumulatorContext) get GC'd, and every task of the
    # materializing job logs "ERROR DAGScheduler: Failed to update
    # accumulator (Unknown class)" — the noise that polluted BENCH_r03's
    # timing windows. Eager materialization runs while the wrapper is
    # alive; downstream reads hit cached blocks, no stale-accumulator
    # updates. Same total work (the scan ran exactly once either way).
    raw = _word_shingles(docs, n=n) \
        .localCheckpoint(eager=True)  # reused by cap + lists branches
    keep = (raw.groupBy("tri").agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap).select("tri"))
    lists = (raw.join(keep, "tri", "left_semi")
             .groupBy("tri")
             .agg(F.sort_array(F.collect_list("doc_id")).alias("ds")))
    sizes = (lists.select(F.explode("ds").alias("doc_id"))
             .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")))
    ds = F.col("ds")
    combs = F.flatten(F.transform(
        ds, lambda x, i: F.transform(
            F.slice(ds, i + 2, F.size(ds)),
            lambda y: F.struct(x.alias("da"), y.alias("db")))))
    inter = (lists.select(F.explode(combs).alias("p"))
             .groupBy(F.col("p.da").alias("da"), F.col("p.db").alias("db"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    # sizes has one row PER DOCUMENT — corpus cardinality, never a
    # broadcast at 100 TB (ADVICE r3). Plain co-keyed shuffle joins:
    # the pair set (inter), not the corpus, bounds the join's output.
    return (inter.join(sa, "da").join(sb, "db")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                4))
            .filter(F.col("jaccard") >= min_jaccard)
            .select("da", "db", "jaccard"))


def diverse_sample(docs: DataFrame, per_bucket: int = 1) -> DataFrame:
    """Near-dup-aware diversity downsampling (the SemDeDup idea on hash
    buckets): keep at most ``per_bucket`` docs per simhash-prefix16
    bucket (lowest doc_ids win, deterministic). Near-identical docs
    share a bucket, so capping the bucket is a cheap semantic-diversity
    proxy with no pairwise scoring.

    Skew-aware two-phase plan: bucket counts first (partial-aggregating
    groupBy, broadcast back — ≤ 2^16 buckets), then ONLY over-cap
    buckets pass through the rank window; under-cap buckets are kept
    with zero sort. A degenerate corpus (everything in one bucket)
    sorts only that bucket, not the corpus. Portable simhash, so any
    md5-capable engine replays the exact keep set.

    Returns kept (doc_id, prefix16, bucket_n).
    """
    sig = (simhash_signatures(docs, portable=True)
           .select("doc_id", "prefix16"))
    cnt = sig.groupBy("prefix16").agg(
        F.count(F.lit(1)).cast("long").alias("bucket_n"))
    sig2 = sig.join(F.broadcast(cnt), "prefix16")
    small = sig2.filter(F.col("bucket_n") <= per_bucket)
    from pyspark.sql.window import Window
    w = Window.partitionBy("prefix16").orderBy("doc_id")
    kept_big = (sig2.filter(F.col("bucket_n") > per_bucket)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= per_bucket).drop("rn"))
    return (small.unionByName(kept_big)
            .select("doc_id", "prefix16", "bucket_n"))


BOILERPLATE = ("all rights reserved redistribution permitted provided this "
               "notice appears in copies")  # 12 words


def plant_boilerplate(docs: DataFrame, every: int = 5) -> DataFrame:
    """Deterministically append a fixed 12-word boilerplate paragraph to
    docs with doc_id % every == 0 — the synthetic corpus has no natural
    repeated spans, so this gives the span-dedup scanner exact ground
    truth (license/footer boilerplate is precisely what span-level dedup
    exists to catch). Test scaffolding, replayable by any engine."""
    return docs.withColumn("text", F.when(
        F.col("doc_id") % every == 0,
        F.concat(F.col("text"), F.lit(" " + BOILERPLATE)))
        .otherwise(F.col("text")))


def duplicated_span_stats(docs: DataFrame, n: int = 8) -> DataFrame:
    """Span-level exact-dup accounting (the Lee-et-al substring-dedup
    measurement, word-n-gram form): per doc, how many tokens sit inside
    some word-n-gram that occurs MORE THAN ONCE in the corpus (counting
    multiplicity — within-doc repeats count too). Returns
    (doc_id, n_tokens, n_dup_tokens, dup_frac).

    Token coverage is the UNION of the duplicated spans' [pos, pos+n-1]
    intervals, computed in one window pass — each span adds
    ``max(0, end - max(prev_max_end, pos-1))`` new tokens, so no
    interval-merge groupBy is needed. 100 TB shape: one explode + one
    span-string groupBy (partial-aggregating; the span is a grouping
    key only for a global COUNT, never a join fan-out) + one per-doc
    window (bounded by the doc's own span count).
    """
    words_df = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("words"))
    w = F.col("words")
    sizes = words_df.select(
        "doc_id", F.size(w).cast("long").alias("n_tokens"))
    idxs = F.when(F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - n + 1)) \
        .otherwise(F.array().cast("array<int>"))
    spans = words_df.select(
        "doc_id",
        F.explode(F.transform(idxs, lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)])
             .alias("span")))).alias("s")) \
        .select("doc_id", F.col("s.pos").alias("pos"),
                F.col("s.span").alias("span"))
    dup = (spans.groupBy("span").agg(F.count(F.lit(1)).alias("m"))
           .filter(F.col("m") >= 2).select("span"))
    hits = spans.join(dup, "span", "left_semi") \
        .withColumn("end", F.col("pos") + n - 1)
    from pyspark.sql.window import Window
    prev = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, -1)
    add = F.greatest(
        F.lit(0).cast("long"),
        F.col("end") - F.greatest(
            F.coalesce(F.max("end").over(prev), F.lit(0)),
            F.col("pos") - 1))
    per_doc = (hits.withColumn("add", add)
               .groupBy("doc_id")
               .agg(F.sum("add").cast("long").alias("n_dup_tokens")))
    return (sizes.join(per_doc, "doc_id", "left")
            .withColumn("n_dup_tokens",
                        F.coalesce("n_dup_tokens", F.lit(0)).cast("long"))
            .withColumn("dup_frac", F.round(
                F.col("n_dup_tokens") /
                F.greatest(F.col("n_tokens"), F.lit(1)), 4))
            .select("doc_id", "n_tokens", "n_dup_tokens", "dup_frac"))


def dedup_exact_keep_first(docs: DataFrame) -> DataFrame:
    """Exact-dedup materializer: one survivor per distinct text, the
    lowest doc_id (deterministic). A ranking window over the text key —
    at scale the window's hash partitioning distributes by text, so
    mass-duplicate texts each land on a single partition but remain
    bounded by their own duplicate count (salt if a single text
    dominates)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("text").orderBy("doc_id")
    return (docs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn"))


def doc_fingerprints(docs: DataFrame, n: int = 5,
                     portable: bool = False) -> DataFrame:
    """(doc_id, fp_min, fp_full): winnowing-style min-shingle rolling-hash
    fingerprint + whole-text hash, for cheap containment/exact checks."""
    h = _portable_hash60 if portable else F.xxhash64
    grams = _word_shingles(docs, n=n).withColumn("h", h(F.col("tri")))
    mins = grams.groupBy("doc_id").agg(F.min("h").alias("fp_min"))
    full = docs.select("doc_id", h(F.col("text")).alias("fp_full"))
    return full.join(mins, "doc_id", "left").orderBy("doc_id")


def editdist_verify(pairs: DataFrame, docs: DataFrame,
                    max_dist: int = 20) -> DataFrame:
    """Edit-distance verification of near-dup CANDIDATE pairs: exact
    Levenshtein over the two texts, keep pairs within ``max_dist``.
    The highest-precision verify stage (character-level, order-aware —
    catches the transposition/typo dups shingle Jaccard over-merges on),
    priced accordingly: O(len^2) per pair, so it runs strictly AFTER a
    bucketing stage has bounded the candidate set, never corpus-wide.
    Both joins fetch text by doc_id (co-keyed); the distance itself is
    the JVM built-in (no Python).
    """
    t = docs.select("doc_id", "text")
    a = t.select(F.col("doc_id").alias("da"), F.col("text").alias("ta"))
    b = t.select(F.col("doc_id").alias("db"), F.col("text").alias("tb"))
    return (pairs.select("da", "db").join(a, "da").join(b, "db")
            .withColumn("edit_dist",
                        F.levenshtein(F.col("ta"), F.col("tb")))
            .filter(F.col("edit_dist") <= max_dist)
            .select("da", "db", "edit_dist"))


def normalized_dup_groups(docs: DataFrame) -> DataFrame:
    """Case/punctuation-invariant exact dedup accounting: normalize
    (lowercase, strip non-alphanumeric-non-space, collapse whitespace)
    and group — catches the re-hosted copy with different casing and
    punctuation that byte-exact dedup misses and near-dup scoring
    wastes a shingle pass on. Map-only normalization (three JVM string
    ops) + one hash aggregate; the normalized key is md5'd before the
    shuffle so grouped rows carry 32 bytes, not document bodies.
    Returns groups with >= 2 members: (norm_key, n_docs, min_doc_id).
    """
    key = normalized_text_fp(F.col("text"))
    return (docs.select("doc_id", key.alias("norm_key"))
            .groupBy("norm_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.min("doc_id").alias("min_doc_id"))
            .filter(F.col("n_docs") >= 2))


def dedup_against_corpus(new_docs: DataFrame,
                         corpus: DataFrame) -> DataFrame:
    """Incremental exact dedup: label each NEW document as 'fresh' or
    'known' against the EXISTING corpus — the admission check a
    recurring ingest runs before appending (full-corpus re-dedup per
    batch would re-pay the whole history every day).

    Scale shape: both sides reduce to md5 fingerprints map-side, the
    corpus side is pre-distinct'd (one row per distinct text ever
    seen), and the check is one co-keyed LEFT SEMI-shaped join on the
    32-byte digest — document bodies never shuffle. In production the
    corpus fingerprint table is materialized once and appended per
    batch (or held as streaming state — ``streaming/curation.py`` is
    the continuous form of this exact check).
    """
    nk = new_docs.select("doc_id", F.md5(F.col("text")).alias("h"))
    ck = corpus.select(F.md5(F.col("text")).alias("h")).distinct()
    known = nk.join(ck, "h", "left_semi").select("doc_id")
    return (nk.join(known.withColumn("k", F.lit(True)), "doc_id", "left")
            .select("doc_id",
                    F.when(F.coalesce(F.col("k"), F.lit(False)), "known")
                    .otherwise("fresh").alias("status"))
            )


def dedup_survivorship(docs: DataFrame,
                       source_priority: dict[str, int]) -> DataFrame:
    """Policy-based exact-dedup survivorship: one survivor per
    normalized-duplicate group, chosen by (most-trusted source, then
    longest text, then lowest doc_id) — production dedup's actual keep
    rule, vs ``dedup_exact_keep_first``'s id-order tiebreak (a crawl
    usually wants the canonical-domain copy, not the first-crawled one).

    ``source_priority`` maps source → rank (lower = more trusted);
    unlisted sources rank after all listed ones. One ranking window
    over the md5 of normalized text — 32-byte grouping keys, the same
    normalization as ``normalized_dup_groups`` so the two operators
    agree on what a duplicate IS. At scale the window hash-partitions
    by fingerprint; a mass-duplicated text is bounded by its own copy
    count (the survivor choice needs the group's rows — salt-and-
    two-phase it only if one text dominates the corpus).
    """
    from pyspark.sql.window import Window

    fp = normalized_text_fp(F.col("text"))
    # fallback rank must sit after the WORST listed rank, not at
    # len(dict) — sparse priorities like {canonical: 0, mirror: 10}
    # would otherwise rank an unlisted source (2) ahead of a listed
    # one (10) and keep the unknown copy (code-review r5)
    unlisted = max(source_priority.values(), default=-1) + 1
    prio = F.coalesce(*[F.when(F.col("source") == k, F.lit(int(v)))
                        for k, v in source_priority.items()],
                      F.lit(unlisted))
    w = Window.partitionBy("fp").orderBy(
        "prio", F.length("text").desc(), "doc_id")
    return (docs.withColumn("fp", fp).withColumn("prio", prio)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "source", F.col("prio").alias("source_rank"),
                    "fp"))
