"""Training-data curation operators beyond dedup: repetition filtering,
PII scanning/redaction, stratified sampling, and token-mixture
accounting (SURVEY.md §2, LLM-data-pipeline block).

All four are pure DataFrame plans — JVM-side expressions end to end, no
Python UDFs — and every one has a DuckDB oracle twin in
``__spark_entry__.oracle_sql()`` (the hash used for sampling is the
repo's engine-portable md5 family, so the oracle replays the exact
keep/drop decision bit-for-bit).

Scale notes (100 TB):
- ``repetition_metrics`` is one explode + two partial-aggregating
  groupBys keyed by doc_id (never by n-gram), so a pathologically
  repetitive document cannot become a hot shuffle key: its bigram
  counts partial-aggregate map-side within the doc's own partition.
- ``pii_scan`` and ``mixture_tokens`` are map-only scans followed by a
  low-cardinality groupBy (source / lang) — partial aggregation reduces
  each task's output to a handful of rows before the shuffle.
- ``sample_stratified`` is a map-only filter: the keep/drop decision is
  a deterministic hash of the row's own id, so it needs no shuffle, no
  state, and resamples identically on retry/resume at any partitioning.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher-style repetition gate: docs whose single most frequent word
# bigram accounts for >= this fraction of all bigram slots are flagged.
TOP_BIGRAM_FRAC_MAX = 0.2

# PII patterns, restricted to syntax that parses identically under
# Java regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+1-\d{3}-\d{4}"


def ws_token_count(text_col: str = "text") -> Column:
    """Whitespace token count, shared by every operator that gates or
    accounts on tokens (packing, mixture, adaptive length, drift) — ONE
    definition so a tokenization tweak cannot silently desynchronize
    packing offsets from gating decisions. Empty/blank text counts 0
    (a bare ``split`` would yield [''] = 1)."""
    trimmed = F.trim(F.col(text_col))
    return F.when(F.length(trimmed) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(trimmed, r"\s+"))).cast("long")


def smoothed_tfidf(tf: Column, df: Column, n_docs: Column) -> Column:
    """THE tf-idf scoring expression — tf × ln((D+1)/(df+1)) — shared by
    keyword extraction (``tfidf_keywords``) and retrieval
    (``operators.search.keyword_search``) so a smoothing change cannot
    silently de-synchronize search ranking from keyword extraction."""
    return tf * F.log((n_docs + 1) / (df + 1))


def _portable_bucket(col: Column, buckets: int = 1000) -> Column:
    """Engine-portable hash bucket: decimal value of the first 15 hex
    chars of md5, mod ``buckets`` — bit-identical in any engine with
    md5 (same family as ``dedup._portable_hash60``)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
            .cast("long") % buckets)


def repetition_metrics(docs: DataFrame,
                       top_frac_max: float = TOP_BIGRAM_FRAC_MAX) -> DataFrame:
    """Per-document repetition metrics (Gopher-style quality signals):

    - ``dup_word_frac``: 1 - distinct words / words (map-only:
      ``array_distinct`` on the already-split array, no shuffle).
    - ``top_bigram_frac``: occurrences of the single most frequent word
      bigram over total bigram slots; ``repetitive`` flags docs at or
      above ``top_frac_max``.

    The bigram max is grouped by doc_id at every stage — the n-gram
    string itself is never a grouping key, so "aaa aaa aaa ..." degrades
    to one row per doc, not one hot key per corpus.
    """
    w = F.col("words")
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("words"))
    stats = base.select(
        "doc_id",
        F.size(w).cast("long").alias("n_words"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_words"))

    idxs = F.when(F.size(w) >= 2, F.sequence(F.lit(0), F.size(w) - 2)) \
        .otherwise(F.array().cast("array<int>"))
    bigrams = F.transform(
        idxs, lambda i: F.concat_ws(" ", F.element_at(w, i + 1),
                                    F.element_at(w, i + 2)))
    top = (base.select("doc_id", F.explode(bigrams).alias("bg"))
           .groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
           .groupBy("doc_id").agg(F.max("cnt").alias("top_bigram_n")))

    out = (stats.join(top, "doc_id", "left")
           .withColumn("top_bigram_n",
                       F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("long"))
           .withColumn("n_bigrams",
                       F.greatest(F.col("n_words") - 1, F.lit(0)).cast("long"))
           .withColumn("dup_word_frac", F.round(
               1 - F.col("n_distinct_words") /
               F.greatest(F.col("n_words"), F.lit(1)), 4))
           .withColumn("top_bigram_frac", F.round(
               F.col("top_bigram_n") /
               F.greatest(F.col("n_bigrams"), F.lit(1)), 4))
           .withColumn("repetitive",
                       F.col("top_bigram_frac") >= F.lit(top_frac_max)))
    return out.select("doc_id", "n_words", "n_bigrams", "dup_word_frac",
                      "top_bigram_n", "top_bigram_frac", "repetitive")


def plant_pii(docs: DataFrame) -> DataFrame:
    """Deterministically plant PII into a synthetic corpus (which has
    none) so the scanner's find/redact path is exercised with known
    ground truth: docs with doc_id % 7 == 0 get an email, % 11 an IPv4,
    % 13 a phone number — all derived from doc_id, so the DuckDB oracle
    plants the exact same strings. Loudly synthetic: this is test
    scaffolding, not part of the scan operator itself."""
    did = F.col("doc_id")
    email = F.when(did % 7 == 0, F.concat(
        F.lit(" contact user"), did.cast("string"), F.lit("@example.com")))
    ip = F.when(did % 11 == 0, F.concat(
        F.lit(" server 10."), (did % 256).cast("string"), F.lit(".0.1 up")))
    phone = F.when(did % 13 == 0, F.concat(
        F.lit(" call +1-555-"), F.lpad((did % 10000).cast("string"), 4, "0")))
    planted = F.concat(F.col("text"),
                       F.coalesce(email, F.lit("")),
                       F.coalesce(ip, F.lit("")),
                       F.coalesce(phone, F.lit("")))
    return docs.withColumn("text", planted)


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-source PII accounting + redaction cost: counts of emails,
    IPv4 addresses, and NANP-style phone numbers, docs containing any,
    and total characters removed by redaction (``[EMAIL]`` / ``[IP]`` /
    ``[PHONE]`` placeholders). Map-only regex scan (JVM regexp, no
    Python) + one low-cardinality groupBy."""
    t = F.col("text")
    n_email = F.regexp_count(t, F.lit(EMAIL_RE))
    n_ip = F.regexp_count(t, F.lit(IPV4_RE))
    n_phone = F.regexp_count(t, F.lit(PHONE_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "[EMAIL]"),
            IPV4_RE, "[IP]"),
        PHONE_RE, "[PHONE]")
    per_doc = docs.select(
        "source", n_email.alias("ne"), n_ip.alias("ni"),
        n_phone.alias("np"),
        (F.length(t) - F.length(redacted)).alias("removed"))
    return (per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("ne") + F.col("ni") + F.col("np") > 0)
                       .cast("long")).alias("n_docs_with_pii"),
                 F.sum("ne").cast("long").alias("n_emails"),
                 F.sum("ni").cast("long").alias("n_ips"),
                 F.sum("np").cast("long").alias("n_phones"),
                 F.sum("removed").cast("long").alias("chars_removed")))


def stratified_keep(docs: DataFrame, rate_permille: Column) -> DataFrame:
    """Deterministic per-stratum sampling materializer: keep a row iff
    its portable-md5 bucket (0..999 on doc_id) falls below the stratum's
    per-mille rate. Map-only — no shuffle, no RNG state; the same row
    makes the same keep/drop decision on any partitioning, any retry,
    and in the DuckDB oracle."""
    return (docs.withColumn("bucket", _portable_bucket(F.col("doc_id")))
            .filter(F.col("bucket") < rate_permille))


CONTAM_PHRASE = "alpha bravo charlie delta echo foxtrot golf hotel india"


def plant_contamination(docs: DataFrame, every: int = 31,
                        eval_every: int = 97) -> DataFrame:
    """Deterministically plant eval-set overlap into a synthetic corpus
    (whose random-word docs share no natural long n-grams): eval docs
    (doc_id % eval_every == 0) AND a known slice of training docs
    (doc_id % every == 0, excluding eval docs) both get the same fixed
    9-word phrase appended, so the scanner has exact ground truth — any
    engine can replay the plant with a CASE. Test scaffolding, not part
    of the scan operator."""
    did = F.col("doc_id")
    hit = (did % eval_every == 0) | (did % every == 0)
    return docs.withColumn("text", F.when(
        hit, F.concat(F.col("text"), F.lit(" " + CONTAM_PHRASE)))
        .otherwise(F.col("text")))


def contamination_report(docs: DataFrame, eval_docs: DataFrame,
                         n: int = 8) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM recipe, word-n-gram
    form): a training doc is CONTAMINATED if it shares any word-n-gram
    with the eval set. Returns per-source accounting over the training
    split: docs, contaminated docs, contamination rate.

    100 TB shape: the eval side is a benchmark suite — thousands of
    docs, millions of shingles — so its distinct-shingle set is
    BROADCAST and the check is a map-side left-semi probe of the
    training shingles; the corpus never shuffles. Per-doc fan-out is
    bounded by the doc's own shingle count (no self-join, so no df cap
    needed). Swap the broadcast for a shuffled semi-join only if the
    eval suite outgrows executor memory."""
    from morra_spark.operators.dedup import _word_shingles

    ev = _word_shingles(eval_docs, n=n).select("tri").distinct()
    hits = (_word_shingles(docs, n=n)
            .join(F.broadcast(ev), "tri", "left_semi")
            .select("doc_id").distinct()
            .withColumn("contaminated", F.lit(1)))
    return (docs.join(hits, "doc_id", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.coalesce("contaminated", F.lit(0)))
                  .cast("long").alias("n_contaminated"))
            .withColumn("contamination_rate", F.round(
                F.col("n_contaminated") / F.col("n_docs"), 4)))


def pack_sequences(docs: DataFrame, ctx_len: int,
                   order_col: str = "doc_id",
                   stream_col: str = "source") -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): within each stream, documents are concatenated in
    ``order_col`` order and split into fixed ``ctx_len``-token context
    windows. Returns per-doc placement: token start/end offsets, the
    chunk the doc starts in, and whether it straddles a chunk boundary
    (those docs get split across two training sequences).

    100 TB shape: ONE running-sum window per stream (the sort is the
    cost; at scale the stream key is (source, shard) so each window
    partition is bounded), everything else map-only arithmetic. No
    first-fit bin packing — concat-and-chunk is order-preserving, so
    it needs no driver state and resumes deterministically."""
    n_tok = ws_token_count()
    from pyspark.sql.window import Window
    w = Window.partitionBy(stream_col).orderBy(order_col)
    placed = (docs.withColumn("n_tok", n_tok)
              .withColumn("end_off", F.sum("n_tok").over(w))
              .withColumn("start_off", F.col("end_off") - F.col("n_tok")))
    return (placed
            .withColumn("chunk_id",
                        (F.col("start_off") / ctx_len).cast("long"))
            .withColumn("straddles",
                        ((F.col("end_off") - 1) / ctx_len).cast("long")
                        > F.col("chunk_id"))
            .select("doc_id", stream_col, "n_tok", "start_off",
                    "end_off", "chunk_id", "straddles"))


def vocab_coverage(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """Tokenizer-vocab sizing accounting: per language, what fraction
    of all token OCCURRENCES the top-``top_k`` most frequent words
    cover (the curve a vocab-size decision reads). Deterministic
    tie-break: (count desc, word asc). Explode + two partial-aggregating
    groupBys keyed by (lang, word) then lang; the per-lang rank window
    runs over the already-aggregated vocab (|vocab| rows, not corpus
    rows), so the sort input is tiny at any corpus scale."""
    from pyspark.sql.window import Window
    words = (docs.select("lang", F.explode(
        F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word").agg(F.count(F.lit(1)).alias("cnt")))
    r = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("word")))
    ranked = words.withColumn("rnk", r)
    return (ranked.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vocab"),
                 F.sum("cnt").cast("long").alias("n_tokens"),
                 F.sum(F.when(F.col("rnk") <= top_k, F.col("cnt"))
                       .otherwise(F.lit(0))).cast("long")
                  .alias("top_k_tokens"))
            .withColumn("coverage", F.round(
                F.col("top_k_tokens") / F.col("n_tokens"), 4))
            .select("lang", "n_vocab", "n_tokens", "top_k_tokens",
                    "coverage"))


def unigram_lm_score(docs: DataFrame) -> DataFrame:
    """LM-based quality scoring (the CCNet idea with the cheapest
    possible LM): per-doc bits-per-token under an add-one-smoothed
    unigram model fit on the corpus itself — boilerplate-ish docs full
    of corpus-frequent words score low (likely), lexically weird docs
    score high. Returns (doc_id, n_tokens, bits_per_token).

    Plan: one explode + (word) count → joined back per occurrence on
    the same key (co-partitioned with the counting shuffle) → per-doc
    sum. The corpus totals (N, V) ride along as a broadcast 1-row
    cross join, not a driver collect."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+"))
        .alias("word")).filter(F.col("word") != "")
    freq = toks.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    totals = freq.agg(F.sum("c").alias("N"),
                      F.count(F.lit(1)).alias("V"))
    scored = (toks.join(freq, "word")
              .crossJoin(F.broadcast(totals))
              .withColumn("bits", -F.log2(
                  (F.col("c") + 1) / (F.col("N") + F.col("V")))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.round(F.sum("bits") / F.count(F.lit(1)), 4)
                  .alias("bits_per_token")))


def tfidf_keywords(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-doc keyword extraction: top-``top_k`` terms by smoothed
    TF-IDF (tf × ln((D+1)/(df+1)); ties broken word-asc so the result
    is deterministic in any engine). The rank window is per doc over
    the doc's own distinct terms — bounded by doc vocabulary, never
    corpus-sized."""
    from pyspark.sql.window import Window
    tf = (docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+"))
        .alias("word")).filter(F.col("word") != "")
        .groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("word").agg(
        F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("D"))
    scored = (tf.join(df_, "word").crossJoin(F.broadcast(n_docs))
              .withColumn("score", F.round(
                  smoothed_tfidf(F.col("tf"), F.col("df"), F.col("D")),
                  4)))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("word"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= top_k)
            .select("doc_id", "rnk", "word", "score"))


def mixture_tokens(docs: DataFrame, weights: dict[str, float],
                   token_budget: int) -> DataFrame:
    """Data-mixture accounting per language: whitespace-token totals,
    corpus share, target mixture weight, and the number of epochs of
    each language needed to fill ``token_budget`` tokens at that weight
    — the sizing report a pre-training data run starts from. Map-only
    token count + one 5-row groupBy; the total is a broadcast scalar
    (computed as a windowless cross-aggregate, not a collect)."""
    n_tok = ws_token_count()
    per_lang = (docs.select("lang", n_tok.alias("n_tok"))
                .groupBy("lang").agg(F.sum("n_tok").alias("n_tokens")))
    total = per_lang.agg(F.sum("n_tokens").alias("total"))
    weight = F.coalesce(*[F.when(F.col("lang") == k, F.lit(v))
                          for k, v in weights.items()], F.lit(0.0))
    return (per_lang.crossJoin(F.broadcast(total))
            .withColumn("corpus_share",
                        F.round(F.col("n_tokens") / F.col("total"), 4))
            .withColumn("weight", weight)
            .withColumn("epochs", F.round(
                F.lit(token_budget) * F.col("weight") / F.col("n_tokens"), 2))
            .select("lang", "n_tokens", "corpus_share", "weight", "epochs"))


def bpe_merge_pairs(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """First step of BPE tokenizer training: the global top-``top_k``
    adjacent character pairs by corpus frequency — the merge candidates
    a BPE trainer would fuse first (SURVEY.md §2, LLM-data-pipeline
    block; Sennrich et al. 2016 merge counting, single round).

    Scale shape: the ONLY corpus-sized shuffle is the word-frequency
    groupBy (partial-aggregating, map-side combine). The pair explode
    runs over the AGGREGATED vocabulary — bounded by distinct words,
    not corpus tokens — weighted by word frequency, exactly like a real
    BPE trainer's word-count preprocessing. Top-k is a
    TakeOrderedAndProject (per-partition heads, driver merge), never a
    global sort. Deterministic tie-break: count desc, pair asc.

    Portable: character indexing via sequence+substring matches DuckDB
    ``substr`` code-point semantics, so the oracle replays the exact
    counts.
    """
    trimmed = F.trim(F.col("text"))
    words = (docs.select(F.explode(F.split(trimmed, r"\s+")).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    idxs = F.when(F.length("word") >= 2,
                  F.sequence(F.lit(1), F.length("word") - 1)) \
        .otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idxs, lambda i: F.concat_ws(
            " ", F.substring(F.col("word"), i, 1),
            F.substring(F.col("word"), i + 1, 1)))
    return (words.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair").agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(top_k)
            .select("pair", F.col("n").cast("long").alias("n")))


def adaptive_length_bounds(docs: DataFrame,
                           approx: bool = False) -> DataFrame:
    """Per-language adaptive length filter: exact interpolated p05/p95
    of the whitespace-token count per ``lang``, joined back (broadcast —
    languages are few) to flag outlier docs. The data-driven version of
    the fixed min/max length gate every curation pass ships: thresholds
    adapt per language instead of punishing terse scripts (zh) with an
    English-calibrated bound.

    Exact ``percentile`` (same linear interpolation as DuckDB
    ``quantile_cont``) is the oracle-checkable form; ``approx=True`` IS
    the 100 TB swap — ``approx_percentile(..., accuracy=10000)``, same
    plan shape, the per-lang sort becomes a mergeable sketch
    (parity with the exact form is pinned by ``test_approx_swaps``).
    Bounds are rounded to 4 dp in BOTH engines before the keep
    comparison, so the decision replays bit-for-bit.
    """
    n_tok = ws_token_count()
    toks = docs.select("doc_id", "lang", n_tok.alias("n_tokens"))
    pctile = ("approx_percentile(n_tokens, {p}, 10000)" if approx
              else "percentile(n_tokens, {p})")
    bounds = (toks.groupBy("lang")
              .agg(F.round(F.expr(pctile.format(p=0.05)), 4).alias("lo"),
                   F.round(F.expr(pctile.format(p=0.95)), 4).alias("hi")))
    return (toks.join(F.broadcast(bounds), "lang")
            .withColumn("keep", (F.col("n_tokens") >= F.col("lo"))
                        & (F.col("n_tokens") <= F.col("hi")))
            .select("doc_id", "lang", "n_tokens", "lo", "hi", "keep"))


def split_assign(docs: DataFrame, train_permille: int = 800,
                 val_permille: int = 900) -> DataFrame:
    """Deterministic train/val/test split assignment (80/10/10 by
    default) via the portable-md5 bucket of ``doc_id`` — the hold-out
    construction step of a training-data pipeline. Map-only: no RNG
    state, no shuffle; the same row lands in the same split on any
    partitioning, any retry, any engine with md5 (the DuckDB oracle
    replays the exact assignment). Unlike ``randomSplit`` the result is
    stable under resume and under repartitioning — the property that
    actually matters when the split decides what a model may ever see.
    """
    b = _portable_bucket(F.col("doc_id"))
    split = (F.when(b < train_permille, F.lit("train"))
             .when(b < val_permille, F.lit("val"))
             .otherwise(F.lit("test")))
    return docs.select("doc_id", "lang", b.alias("bucket"),
                       split.alias("split"))


def char_entropy(docs: DataFrame, min_bits: float = 2.0) -> DataFrame:
    """Per-document Shannon entropy of the character distribution
    (bits/char) — the cheap gibberish/boilerplate detector: natural
    prose sits near 4 bits, "aaaa..." near 0, base64 blobs near 6. Docs
    below ``min_bits`` are flagged ``low_entropy``.

    Plan: MAP-ONLY — zero shuffles. The char array, its distinct set,
    and the entropy fold are all row-local higher-order functions
    (transform / filter / aggregate), so no row ever explodes into
    per-character rows and nothing exchanges. Per-row cost is
    O(len × distinct_chars) JVM arithmetic — the trade that wins at
    100 TB, where the exploded form ships one shuffled row per corpus
    character. Character indexing uses sequence+substring (code-point
    semantics shared with DuckDB ``substr``), so the oracle replays the
    exact entropy.
    """
    n = F.length("text")
    chars = F.transform(F.sequence(F.lit(1), n),
                        lambda i: F.substring(F.col("text"), i, 1))
    # empty texts are excluded (Spark's sequence(1, 0) is DESCENDING
    # [1, 0], not empty — it would fabricate two \'\' chars per empty doc)
    base = docs.filter(n >= 1).withColumn("_chars", chars)
    cs = F.col("_chars")

    # one O(len) scan per distinct char: materialize the counts array
    # first, then fold entropy over the counts — not a p*log2(p) form
    # that would instantiate the frequency scan twice per char
    counts = F.transform(
        F.array_distinct(cs),
        lambda c: F.size(F.filter(cs, lambda x: x == c)))
    ent = -F.aggregate(
        counts, F.lit(0.0),
        lambda acc, k: acc + (k / F.size(cs)) * F.log2(k / F.size(cs)))
    return (base.select(
        "doc_id", F.size(cs).cast("long").alias("n_chars_text"),
        F.round(ent, 4).alias("entropy_bits"))
        .withColumn("low_entropy", F.col("entropy_bits") < F.lit(min_bits)))


def quality_tiers(docs: DataFrame, tiers: int = 10) -> DataFrame:
    """Per-language quality tiering: NTILE(``tiers``) over the unigram-LM
    bits-per-token score (best = tier 1) — the binning step behind
    quality-bucketed mixing (e.g. upsample the top tier, drop the
    bottom). Composes ``unigram_lm_score``; ordering is fully
    deterministic (score asc, doc_id asc), so the tier assignment
    replays bit-for-bit in any engine with NTILE.

    Scale note: NTILE needs each language's docs sorted — one range
    exchange per lang partition. At 100 TB swap the exact NTILE for
    approx_percentile tier BOUNDARIES (computed on a sketch, mergeable)
    + a map-only bin lookup: same output contract, no global sort. The
    exact form is the oracle-checkable one.
    """
    from pyspark.sql.window import Window

    scored = unigram_lm_score(docs.select("doc_id", "text")) \
        .join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.asc("bits_per_token"), F.asc("doc_id"))
    return (scored.withColumn("tier", F.ntile(tiers).over(w))
            .select("doc_id", "lang", "bits_per_token", "tier"))


def quality_tiers_approx(docs: DataFrame, tiers: int = 10,
                         accuracy: int = 10000) -> DataFrame:
    """The 100 TB swap ``quality_tiers`` documents: approx_percentile
    tier BOUNDARIES (mergeable sketch, one partial-aggregating groupBy
    per lang — no per-lang global sort) + a map-only bin lookup.

    Same output contract as the exact NTILE form: (doc_id, lang,
    bits_per_token, tier). Tier = 1 + number of boundaries strictly
    below the score; ties inside a sketch cell can land a doc one tier
    off the exact NTILE assignment (and NTILE's equal-bucket-size
    rounding differs from quantile binning at duplicate scores), which
    is exactly the tolerance ``test_approx_swaps`` pins. The sketch's
    error bound is 1/accuracy of the rank, so misassignments concentrate
    at tier boundaries only.
    """
    scored = unigram_lm_score(docs.select("doc_id", "text")) \
        .join(docs.select("doc_id", "lang"), "doc_id")
    probs = ", ".join(str(i / tiers) for i in range(1, tiers))
    bounds = (scored.groupBy("lang")
              .agg(F.expr(f"approx_percentile(bits_per_token, "
                          f"array({probs}), {accuracy})").alias("bs")))
    # boundaries are per-lang tiny arrays -> broadcast; the corpus-side
    # pass stays map-only (aggregate over the 9-element array per row)
    tier = (F.aggregate(
        "bs", F.lit(1),
        lambda acc, b: acc + F.when(F.col("bits_per_token") > b, 1)
        .otherwise(0)))
    return (scored.join(F.broadcast(bounds), "lang")
            .select("doc_id", "lang", "bits_per_token",
                    tier.cast("int").alias("tier")))


def weighted_sample(docs: DataFrame, k: int, weight: Column) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (top-``k``
    by weight-scaled exponential order statistics — the A-ES /
    Efraimidis–Spirakis recipe): each row draws key = -ln(u) / w with u
    a portable-md5 uniform of its own doc_id, and the k SMALLEST keys
    win. One map pass + a TakeOrderedAndProject; no RNG state, no
    shuffle beyond the top-k merge, the same rows win on any
    partitioning / retry / engine with md5+ln (the oracle replays the
    draw exactly; keys are rounded to 8 dp with a doc_id tie-break so
    cross-engine float noise cannot flip the cut).
    """
    # u in (0, 1): 60-bit md5 prefix scaled; +0.5 keeps u > 0
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10).cast("double") + 0.5) / F.lit(float(1 << 60))
    key = F.round(-F.log(u) / weight, 8)
    return (docs.select("doc_id", weight.alias("w"), key.alias("es_key"))
            .orderBy(F.asc("es_key"), F.asc("doc_id")).limit(k))


def build_vocab(docs: DataFrame, size: int) -> DataFrame:
    """Frequency-ranked word vocabulary: (word, token_id) with id 0..
    ``size``-1 assigned by count desc, word asc (deterministic). One
    partial-aggregating word count + a TakeOrdered — the vocab TABLE is
    tiny (``size`` rows) even when the corpus is not, which is what
    makes the encode join a broadcast."""
    words = (docs.select(F.explode(
        F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("n")))
    ranked = words.orderBy(F.desc("n"), F.asc("word")).limit(size)
    from pyspark.sql.window import Window
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    # the window runs over the already-limited `size` rows — driver-tiny
    return ranked.select(
        "word", (F.row_number().over(w) - 1).cast("int").alias("token_id"))


def encode_tokens(docs: DataFrame, vocab: DataFrame,
                  oov_id: int = -1) -> DataFrame:
    """Tokenizer ENCODE step: map each document's words to vocabulary
    ids, long form (doc_id, pos, token_id) with out-of-vocabulary words
    as ``oov_id``. posexplode preserves position; the vocab join is a
    BROADCAST (the table is vocab-sized); output order is (doc_id, pos)
    so sequences reassemble exactly. This is the map pass that turns a
    curated corpus into model input — everything upstream (counts,
    coverage, merges) exists to make this cheap and deterministic."""
    toks = (docs.select(
        "doc_id", F.posexplode(
            F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "word"))
        .filter(F.col("word") != ""))
    return (toks.join(F.broadcast(vocab), "word", "left")
            .select("doc_id", F.col("pos").cast("int").alias("pos"),
                    F.coalesce(F.col("token_id"), F.lit(oov_id))
                    .cast("int").alias("token_id")))


def mixture_rebalance(docs: DataFrame,
                      targets: dict[str, float]) -> DataFrame:
    """Downsample-only source-mixture rebalancing: compute, per source,
    the keep probability that moves the corpus to the ``targets`` token
    mixture, apply it with the portable-md5 doc decision, and report
    before/after — the source re-weighting step (a DoReMi-style weight
    vector applied by downsampling) between mixture ACCOUNTING
    (``mixture_tokens``) and training-layout writes.

    The achievable corpus size under downsampling-only is capped by the
    binding source (the one with the least headroom): budget =
    min_s(n_tokens_s / share_s); every source then keeps
    ``share_s * budget`` tokens in expectation. Keep decisions are
    doc-level on the md5 permille bucket of ``doc_id`` — deterministic
    under retries, partitioning, and engines (the DuckDB oracle replays
    the exact decision), and the permille is floored to an integer so
    there is no float boundary inside the comparison.

    Scale shape: one token-count aggregate over the corpus (few-row
    result), the rates broadcast back, one map-only keep decision, one
    closing aggregate — document bodies are never shuffled; a second
    full scan is inherent to rate-then-apply (the rate needs the
    totals) and both scans are partial-aggregating.
    """
    n_tok = ws_token_count()
    # targets join in as a real (tiny) frame, FULL OUTER against the
    # observed sources: a target source with zero corpus rows must
    # still bind the budget (its headroom is 0, so the honest
    # downsample-only budget is 0) and must appear in the report —
    # the old CASE-expression share silently dropped it, so the caller
    # read a report that looked like the mixture was achieved
    # (code-review r5)
    tgt = docs.sparkSession.createDataFrame(
        [(k, float(v)) for k, v in targets.items()],
        "source string, target_share double")
    per_src = (docs.select("source", n_tok.alias("n_tok"))
               .groupBy("source")
               .agg(F.sum("n_tok").alias("n_tokens_before"))
               # no broadcast hint: Spark can't broadcast a FULL OUTER
               # side, and both inputs here are source-cardinality
               .join(tgt, "source", "full_outer")
               .select("source",
                       F.coalesce("n_tokens_before", F.lit(0))
                       .cast("long").alias("n_tokens_before"),
                       F.coalesce("target_share", F.lit(0.0))
                       .alias("target_share")))
    budget = (per_src.filter(F.col("target_share") > 0)
              .agg(F.min(F.col("n_tokens_before") / F.col("target_share"))
                   .alias("budget")))
    rates = (per_src.crossJoin(F.broadcast(budget))
             .withColumn(
                 "p_keep_permille",
                 # a source with zero tokens has nothing to keep — guard
                 # the rate division (ANSI Spark 4 raises on x/0)
                 F.when(F.col("n_tokens_before") <= 0, F.lit(0))
                 .otherwise(F.least(F.lit(1000), F.floor(
                     (F.lit(1000.0) * F.col("target_share")
                      * F.col("budget")) / F.col("n_tokens_before"))))
                 .cast("int"))
             .select("source", "n_tokens_before", "target_share",
                     "p_keep_permille"))
    kept = (docs.select("source", F.col("doc_id"), n_tok.alias("n_tok"))
            .join(F.broadcast(rates.select("source", "p_keep_permille")),
                  "source")
            .filter(_portable_bucket(F.col("doc_id"))
                    < F.col("p_keep_permille"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
                 F.sum("n_tok").alias("n_tokens_kept")))
    return (rates.join(kept, "source", "left")
            .select("source", "n_tokens_before",
                    F.round("target_share", 4).alias("target_share"),
                    "p_keep_permille",
                    F.coalesce("n_docs_kept", F.lit(0)).cast("long")
                    .alias("n_docs_kept"),
                    F.coalesce("n_tokens_kept", F.lit(0)).cast("long")
                    .alias("n_tokens_kept")))


def split_leakage(docs: DataFrame, train_permille: int = 800,
                  val_permille: int = 900) -> DataFrame:
    """Cross-split leakage audit: normalized-exact duplicate documents
    that landed in DIFFERENT splits of ``split_assign``'s deterministic
    assignment — the check a training-data release runs before claiming
    its eval split is clean (near-dup decontamination is
    ``contamination_report``; this is the exact-copy tier over the
    split boundary itself).

    Plan: normalize + md5 fingerprint (map-only, 32-byte keys — bodies
    never shuffle), ONE (fingerprint, split) partial-aggregating
    groupBy, then a self-join on fingerprint over that aggregated grain
    — a fingerprint duplicated a million times contributes at most one
    row per split to the join, so a hot boilerplate cannot quadratic
    the audit. Output: one row per (split_a, split_b) ordered pair
    (a < b) with the duplicate-pair count and distinct leaked
    fingerprints.
    """
    from morra_spark.operators.dedup import normalized_text_fp

    b = _portable_bucket(F.col("doc_id"))
    split = (F.when(b < train_permille, F.lit("train"))
             .when(b < val_permille, F.lit("val"))
             .otherwise(F.lit("test")))
    per = (docs.select(normalized_text_fp(F.col("text")).alias("fp"),
                       split.alias("split"))
           .groupBy("fp", "split")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    a, c = per.alias("a"), per.alias("b")
    pairs = a.join(c, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.split") < F.col("b.split")))
    return (pairs.groupBy(F.col("a.split").alias("split_a"),
                          F.col("b.split").alias("split_b"))
            .agg(F.sum(F.col("a.n") * F.col("b.n")).alias("n_dup_pairs"),
                 F.count(F.lit(1)).cast("long").alias("n_leaked_fps"))
            .orderBy("split_a", "split_b"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 8) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    retrieval/context-window chunker (the inverse of ``pack_sequences``:
    packing concatenates short docs, chunking splits long ones). Chunk
    starts step by ``chunk_tokens - overlap``; the last chunk may be
    short; empty documents produce no chunks. A trailing start whose
    window is fully contained in the previous chunk (the previous chunk
    already reached the end of the document — any start ``s > 0`` with
    ``s >= n - overlap``) is never generated, so the embed/index stage
    downstream sees no pure-overlap duplicate chunks (code-review r5).
    Output order is unspecified, like every other operator here —
    callers that need a sort add it (the global sort this function used
    to end with belongs to no 100 TB plan).

    Map-only: tokenize once, posexplode a generated starts sequence,
    slice + rejoin per chunk — no shuffle anywhere, so it chunks 100 TB
    at scan speed and the downstream embed/index stage gets
    (doc_id, chunk_idx) lineage for free.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = ws_token_count()
    starts = F.when(n > 0, F.sequence(
        F.lit(0), F.greatest(n - F.lit(overlap) - 1, F.lit(0)),
        F.lit(step))).otherwise(
        F.expr("array()").cast("array<long>"))
    t = docs.select("doc_id", n.alias("n_tokens"),
                    toks.alias("toks"), starts.alias("starts"))
    ex = t.select("doc_id", "n_tokens",
                  F.posexplode("starts").alias("chunk_idx", "start"),
                  "toks")
    chunk = F.slice("toks", F.col("start").cast("int") + 1, chunk_tokens)
    return ex.select("doc_id", F.col("chunk_idx").cast("int"),
                     F.size(chunk).cast("int").alias("chunk_len"),
                     F.array_join(chunk, " ").alias("chunk_text"))
