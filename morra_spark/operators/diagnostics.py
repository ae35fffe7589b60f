"""Shuffle-key skew diagnostics (SURVEY.md §4.2 — the measurement side
of the salting/AQE decisions the join and agg operators make).

Before keying a 100 TB join or aggregation, the question is never "is
this key skewed?" in the abstract — it's "what share of rows does the
hottest key own, and how many effective partitions does the
distribution actually support?". ``key_skew_report`` answers both with
one partial-aggregating groupBy over the key (cost bounded by key
cardinality, not row count) and returns the numbers that pick the
strategy: top-key share ≳ 1/shuffle-partitions → that key is a straggler
task; entropy in bits ≈ log2(effective key count) → 2^entropy well-spread
partitions is the most parallelism the key can give you.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def key_skew_report(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Top-``top_k`` hottest values of ``key`` with their row share,
    plus distribution-level columns repeated per row (total rows,
    distinct keys, Shannon entropy of the key distribution in bits —
    log2(effective parallelism)).

    Plan: ONE groupBy(key) count (partial aggregation — a hot key
    combines map-side, so measuring skew never suffers it), one
    single-row aggregate over the per-key counts (cardinality-bounded),
    one broadcast-back, and a TakeOrderedAndProject for the top-k.
    Deterministic tie-break: count desc, key asc.
    """
    counts = df.groupBy(F.col(key).alias("key_value")) \
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    share = F.col("n") / F.col("total_rows")
    totals = counts.agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        (F.log2(F.sum("n"))
         - F.sum(F.col("n") * F.log2(F.col("n"))) / F.sum("n"))
        .alias("entropy_bits"))
    return (counts.crossJoin(F.broadcast(totals))
            .select("key_value", "n",
                    F.round(share, 6).alias("share"),
                    "total_rows", "n_keys",
                    F.round(F.col("entropy_bits"), 4).alias("entropy_bits"))
            .orderBy(F.desc("n"), F.asc("key_value")).limit(top_k))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention in long form: users are cohorted by the
    ISO week of their FIRST event; for each (cohort_week, week_offset)
    the count of cohort users active that week and the retention rate
    vs the cohort's size.

    Plan shape: one user-grain aggregate for the cohort week, one
    distinct user-week activity set (both partial-aggregating, keyed by
    user), one user-keyed join (co-partitioned — the same shuffle key
    back to back, no extra exchange beyond the first), then a
    low-cardinality (cohort, offset) aggregate. No window over the raw
    event log.
    """
    u, ts = F.col(user_col), F.col(ts_col)
    wk = F.date_trunc("week", ts).cast("date")
    first = (events.select(u.alias("user"), wk.alias("w"))
             .groupBy("user").agg(F.min("w").alias("cohort_week")))
    active = (events.select(u.alias("user"), wk.alias("active_week"))
              .distinct())
    joined = active.join(first, "user")
    offset = F.floor(F.datediff(F.col("active_week"),
                                F.col("cohort_week")) / 7).cast("int")
    per_cell = (joined.select("user", "cohort_week", offset.alias("week_offset"))
                .groupBy("cohort_week", "week_offset")
                .agg(F.count(F.lit(1)).cast("long").alias("n_active")))
    size_w = Window.partitionBy("cohort_week")
    return (per_cell.withColumn(
        "cohort_size",
        F.max(F.when(F.col("week_offset") == 0, F.col("n_active")))
        .over(size_w).cast("long"))
        .withColumn("retention",
                    F.round(F.col("n_active") / F.col("cohort_size"), 4))
        .select("cohort_week", "week_offset", "n_active", "cohort_size",
                "retention"))


def corpus_drift(old: DataFrame, new: DataFrame,
                 group_col: str = "lang") -> DataFrame:
    """Distribution drift between two corpus versions, per group: doc
    counts plus the Jensen-Shannon divergence (bits, 0 = identical,
    1 = disjoint) of the doc-length histograms (log2-binned
    whitespace-token counts). The regression detector a recurring
    ingest runs before retraining: a jump in JS for one language means
    the new crawl changed SHAPE there, not just size.

    Plan: each side is one map pass + a (group, bin) partial aggregate
    (bin cardinality ~ log2(max doc len), so tiny), a full-outer join
    of the two histograms on (group, bin), and a per-group fold —
    nothing scales with corpus rows past the first aggregate.
    """
    def hist(df: DataFrame, side: str) -> DataFrame:
        from morra_spark.operators.curation import ws_token_count

        b = F.floor(F.log2(ws_token_count() + 1)).cast("int")
        return (df.select(F.col(group_col).alias("grp"), b.alias("bin"))
                .groupBy("grp", "bin")
                .agg(F.count(F.lit(1)).cast("long").alias(f"n_{side}")))

    h = hist(old, "old").join(hist(new, "new"), ["grp", "bin"],
                              "full_outer") \
        .fillna(0, subset=["n_old", "n_new"])
    tot = h.groupBy("grp").agg(
        F.sum("n_old").cast("long").alias("docs_old"),
        F.sum("n_new").cast("long").alias("docs_new"))
    j = h.join(tot, "grp")
    p = F.col("n_old") / F.greatest(F.col("docs_old"), F.lit(1))
    q = F.col("n_new") / F.greatest(F.col("docs_new"), F.lit(1))
    m = (p + q) / 2
    term = (F.when(F.col("n_old") > 0, 0.5 * p * F.log2(p / m))
            .otherwise(F.lit(0.0))
            + F.when(F.col("n_new") > 0, 0.5 * q * F.log2(q / m))
            .otherwise(F.lit(0.0)))
    agg = (j.groupBy("grp")
           .agg(F.max("docs_old").alias("docs_old"),
                F.max("docs_new").alias("docs_new"),
                F.round(F.sum(term), 6).alias("js_divergence")))
    # a group present in only one snapshot is MAXIMALLY drifted: the
    # raw sum degenerates to 0.5 there (all mass on one side), which
    # would read as half-drifted on the documented 0..1 scale
    return agg.withColumn(
        "js_divergence",
        F.when((F.col("docs_old") == 0) | (F.col("docs_new") == 0),
               F.lit(1.0)).otherwise(F.col("js_divergence")))


def rolling_zscore(events: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", val_col: str = "value",
                   lookback: int = 20, z_max: float = 3.0,
                   tiebreak_col: str | None = "event_id") -> DataFrame:
    """Per-key rolling anomaly score: each event's value standardized
    against the mean/stddev of its own PRECEDING ``lookback`` events
    (frame ends at 1 PRECEDING — the current value never contaminates
    its own baseline). ``anomalous`` flags |z| > ``z_max``; rows with
    fewer than 2 priors have no defined baseline (z NULL, not flagged).

    The metric-regression tripwire over any per-entity time series —
    ingest volume per source, triples per conversation, latency per
    host. ONE window sort per key partition, both aggregates share the
    frame; deterministic ordering via (ts, event_id) so equal
    timestamps can't reshuffle baselines between runs.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-lookback, -1))
    mu = F.avg(val_col).over(w)
    sd = F.stddev_samp(val_col).over(w)
    # deliberately NO in-engine rounding: frame means of short-decimal
    # inputs land exactly on .xxx5 rounding ties, where Java (shortest
    # decimal repr, HALF_UP) and C/DuckDB (binary value, half-away)
    # disagree systematically; raw doubles compared at coarse precision
    # downstream never sit near a tie
    # nullif(sd, 0): a zero-variance lookback window (identical priors)
    # must yield NULL, not IEEE ±Inf/NaN — matches DuckDB's division-by-
    # zero NULL so the oracle's zscore IS NOT NULL filter agrees (ADVICE
    # r3); a constant baseline genuinely defines no anomaly score
    z = (F.col(val_col) - mu) / F.nullif(sd, F.lit(0.0))
    id_cols = [tiebreak_col] if tiebreak_col else []
    return (events.select(
        key_col, *id_cols, ts_col, F.col(val_col).alias("value"),
        mu.alias("baseline_mean"),
        sd.alias("baseline_sd"),
        z.alias("zscore"))
        .withColumn("anomalous",
                    F.coalesce(F.abs(F.col("zscore")) > F.lit(z_max),
                               F.lit(False))))


def ab_metric_test(events: DataFrame, assign_col: str = "user_id",
                   metric_col: str = "value",
                   group_col: str = "event_type") -> DataFrame:
    """Two-sample comparison per metric group: users are split A/B by
    the portable-md5 parity of ``assign_col`` (deterministic, engine-
    replayable — the same property the split/sampling operators lean
    on), and each ``group_col`` gets Welch's t-statistic with
    Welch–Satterthwaite degrees of freedom and a |t| > 1.96 flag.

    The guardrail check after any pipeline change: "did quality scores
    / latencies / token counts move?" answered per segment with one
    partial-aggregating groupBy — means and variances are sufficient
    statistics, so nothing but (group, arm) aggregates ever shuffles.
    """
    from morra_spark.operators.curation import _portable_bucket

    arm = (_portable_bucket(F.col(assign_col)) % 2 == 0)
    per = (events.select(F.col(group_col).alias("grp"),
                         arm.alias("is_a"),
                         F.col(metric_col).cast("double").alias("x"))
           .groupBy("grp", "is_a")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.avg("x").alias("m"),
                F.var_samp("x").alias("v")))
    a = per.filter(F.col("is_a")).select(
        "grp", F.col("n").alias("na"), F.col("m").alias("ma"),
        F.col("v").alias("va"))
    b = per.filter(~F.col("is_a")).select(
        "grp", F.col("n").alias("nb"), F.col("m").alias("mb"),
        F.col("v").alias("vb"))
    j = a.join(b, "grp")
    sa, sb = F.col("va") / F.col("na"), F.col("vb") / F.col("nb")
    # nullif guards the zero-variance metric (both arms constant →
    # sa+sb = 0): under ANSI Spark 4 the bare division aborts the whole
    # guardrail report with DIVIDE_BY_ZERO; null t_stat/dof (undefined
    # test) is the correct report row instead — same discipline as
    # metric_correlations' try_divide (code-review r5)
    t = (F.col("ma") - F.col("mb")) / F.sqrt(F.nullif(sa + sb, F.lit(0.0)))
    dof = (sa + sb) * (sa + sb) / F.nullif(
        sa * sa / (F.col("na") - 1) + sb * sb / (F.col("nb") - 1),
        F.lit(0.0))
    return (j.select("grp", "na", "nb",
                     F.round("ma", 4).alias("mean_a"),
                     F.round("mb", 4).alias("mean_b"),
                     F.round(t, 4).alias("t_stat"),
                     F.round(dof, 1).alias("dof"))
            .withColumn("significant", F.abs(F.col("t_stat")) > 1.96))


def rolling_active_users(events: DataFrame, window_days: int = 7,
                         user_col: str = "user_id",
                         ts_col: str = "ts") -> DataFrame:
    """Rolling N-day distinct active users per day (the WAU/MAU
    metric), exactly.

    Scale pattern: distinct (user, day) first (partial-aggregating,
    the only corpus-sized reduction), then each active day EXPLODES
    into the ``window_days`` report days it contributes to (map-only,
    bounded ×N fan-out), then count-distinct per report day. This
    avoids the range self-join (days × days) AND the per-day re-scan
    of N days of raw events — the fan-out rides on the already-reduced
    user-day grain. Report days are clipped to the observed range, so
    leading days reflect partial windows honestly.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    ud = events.select(F.col(user_col).alias("u"),
                       day.alias("d")).distinct()
    bounds = ud.agg(F.max("d").alias("dmax"))
    contrib = (ud.crossJoin(F.broadcast(bounds))
               .select("u", F.explode(F.sequence(
                   F.col("d"),
                   F.least(F.date_add(F.col("d"), window_days - 1),
                           F.col("dmax")))).alias("report_day")))
    return (contrib.groupBy("report_day")
            .agg(F.countDistinct("u").cast("long").alias("active_users"))
            .orderBy("report_day"))


def value_histogram(df: DataFrame, col: str, bins: int = 20) -> DataFrame:
    """Equi-width histogram with data-derived bounds: one bounds
    aggregate (broadcast back — two scalars), then a MAP-ONLY binning
    pass + a ``bins``-cardinality count. The distribution sketch every
    metric investigation starts with; at 100 TB the two passes cost two
    scans, or reuse stored table stats for the bounds and drop to one.
    Values at the top edge clamp into the last bin; a constant column
    degenerates to one bin rather than dividing by zero.
    """
    x = F.col(col).cast("double")
    b = df.agg(F.min(x).alias("lo"), F.max(x).alias("hi"))
    width = F.greatest((F.col("hi") - F.col("lo")) / bins, F.lit(1e-12))
    bin_id = F.least(F.floor((F.col("x") - F.col("lo")) / width),
                     F.lit(bins - 1)).cast("int")
    return (df.select(x.alias("x")).crossJoin(F.broadcast(b))
            .select(bin_id.alias("bin"), "lo", "hi")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(F.min(F.col("lo")
                               + F.col("bin") * width), 4).alias("bin_lo"),
                 F.round(F.min(F.col("lo")
                               + (F.col("bin") + 1) * width), 4)
                 .alias("bin_hi"))
            .orderBy("bin"))


def metric_correlations(events: DataFrame,
                        group_col: str = "event_type") -> DataFrame:
    """Per-group Pearson correlation panel over the event stream:
    corr(value, hour-of-day) and corr(value, day-of-week) — the
    seasonality screen that decides whether a metric needs
    time-of-day normalization before anomaly detection
    (``rolling_zscore``) can be trusted. Sufficient-statistics
    aggregate: one partial-aggregating groupBy, nothing else shuffles.
    """
    hour = F.hour(F.col("ts")).cast("double")
    dow = F.dayofweek(F.col("ts")).cast("double")
    v = F.col("value").cast("double")
    # corr() under ANSI mode throws DIVIDE_BY_ZERO on a zero-variance
    # side; covar_samp / (sd*sd) is algebraically identical Pearson and
    # try_divide yields NULL there (matching DuckDB CORR's NULL)
    def safe_corr(a: str, b: str):
        return F.expr(f"try_divide(covar_samp({a}, {b}),"
                      f" stddev_samp({a}) * stddev_samp({b}))")

    return (events.select(F.col(group_col).alias("grp"),
                          v.alias("v"), hour.alias("h"), dow.alias("d"))
            .groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.round(safe_corr("v", "h"), 4).alias("corr_value_hour"),
                 F.round(safe_corr("v", "d"), 4).alias("corr_value_dow"))
            .orderBy("grp"))
