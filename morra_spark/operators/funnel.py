"""Ordered funnel analysis over an event log (SURVEY.md §2 Part B
analytics surface): how many users complete step 1, then step 2 strictly
after their first step-1 event, and so on.

Spark-first plan: ONE shuffle total. Events are pruned to the funnel's
own types at the scan, grouped per user with an ordered
``sort_array(collect_list(struct(ts, type)))``, and the step timestamps
are computed by a single JVM-side ``F.aggregate`` fold over the sorted
list — no join-back per step (the textbook chained-aggregation funnel
re-shuffles or re-joins the log once per step; this walks each user's
history once). The fold state is a struct of k nullable timestamps;
step i fires on the first event of type i strictly after t_{i-1}, which
equals the chained form's ``MIN(ts) FILTER (type = s_i AND ts > t_{i-1})``
because the walk is time-ordered (the DuckDB oracle replays the chained
form and must agree).

Scale note: per-user state is the user's own funnel events only (the
type prune keeps the collect_list bounded by funnel activity, not total
activity); a pathological single user is bounded by the same
``collect_list`` caveat as ordered reassembly (operators/reassembly.py)
and would be chunked the same way.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_user_steps(events: DataFrame, steps: list[str],
                      user_col: str = "user_id", ts_col: str = "ts",
                      type_col: str = "event_type",
                      within_hours: int | None = None) -> DataFrame:
    """Per-user step-completion timestamps: (user, t1..tk) where t1 is
    the user's first ``steps[0]`` event and t_i the first ``steps[i-1]``
    event strictly after t_{i-1} (NULL once a step is never reached).
    With ``within_hours`` set, step i must also land within that many
    hours of t_{i-1} (the standard conversion-window funnel — without
    it, any long-lived user eventually "converts")."""
    k = len(steps)
    ev = (events.filter(F.col(type_col).isin(steps))
          .groupBy(user_col)
          .agg(F.sort_array(F.collect_list(F.struct(
              F.col(ts_col).alias("ts"),
              F.col(type_col).alias("et")))).alias("evs")))

    init = F.struct(*[F.lit(None).cast("timestamp").alias(f"t{i}")
                      for i in range(1, k + 1)])

    def walk(acc, e):
        fields = []
        for i, s in enumerate(steps, start=1):
            # acc is the PRE-event state: t_{i-1} can only have been set
            # by an earlier (<= ts) event, so "first type-i event after
            # t_{i-1}" is exactly the chained-aggregation MIN.
            if i == 1:
                ready = F.lit(True)
            else:
                ready = acc[f"t{i-1}"].isNotNull() & \
                    (e["ts"] > acc[f"t{i-1}"])
                if within_hours is not None:
                    ready = ready & (e["ts"] <= acc[f"t{i-1}"] +
                                     F.expr(f"INTERVAL {within_hours} HOURS"))
            fields.append(
                F.when(acc[f"t{i}"].isNull() & (e["et"] == s) & ready,
                       e["ts"]).otherwise(acc[f"t{i}"]).alias(f"t{i}"))
        return F.struct(*fields)

    folded = ev.select(user_col,
                       F.aggregate("evs", init, walk).alias("st"))
    return folded.select(user_col,
                         *[F.col(f"st.t{i}").alias(f"t{i}")
                           for i in range(1, k + 1)])


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  within_hours: int | None = None) -> DataFrame:
    """Funnel summary: one row per step with the number of users who
    reached it (in order) and the overall conversion from step 1."""
    k = len(steps)
    per_user = funnel_user_steps(events, steps, user_col, ts_col,
                                 type_col, within_hours)
    row = per_user.agg(*[F.count(f"t{i}").cast("long").alias(f"n{i}")
                         for i in range(1, k + 1)])
    # step names are interpolated into SQL string literals — escape
    # embedded quotes ("int'l checkout") or the stack() expression
    # fails to parse (code-review r5)
    stack_args = ", ".join(
        "{}, '{}', n{}".format(i, s.replace("'", "\\'"), i)
        for i, s in enumerate(steps, start=1))
    from pyspark.sql.window import Window
    whole = Window.orderBy(F.lit(1)) \
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    n1 = F.max(F.when(F.col("step_idx") == 1, F.col("n_users"))).over(whole)
    return (row.select(F.expr(
        f"stack({k}, {stack_args}) as (step_idx, step, n_users)"))
        .withColumn("conversion", F.round(
            F.col("n_users") / F.greatest(n1, F.lit(1)), 4))
        .select("step_idx", "step", "n_users", "conversion"))


def top_event_paths(events: DataFrame, max_len: int = 4,
                    top_k: int = 10) -> DataFrame:
    """Path analysis: the ``top_k`` most common initial event-type
    journeys (first ``max_len`` events per user, in (ts, event_id)
    order). ONE shuffle: per-user ``sort_array(collect_list(struct))``
    — the same single-pass shape as the funnel fold — then a slice +
    join to a low-cardinality path aggregate. Deterministic tie-break:
    count desc, path asc.
    """
    ordered = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id",
                                             "event_type"))),
        lambda s: s["event_type"])
    per_user = (events.groupBy("user_id")
                .agg(F.concat_ws(
                    " > ", F.slice(ordered, 1, max_len)).alias("path")))
    return (per_user.groupBy("path")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
            .orderBy(F.desc("n_users"), F.asc("path")).limit(top_k))
