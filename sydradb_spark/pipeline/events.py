"""Event-sequence analytics over the events table
``(user_id long, event_type string, ts, ...)`` — funnel conversion.

Scale design: ONE shuffle. Events are filtered to the funnel's step types
at the scan (predicate pushdown on `event_type`), grouped per user, and the
ordered walk runs as a JVM array fold over each user's (small) event list.
The alternative — one join per funnel step — costs k shuffles and
re-materializes the user set each step; the fold costs one `groupBy(user)`
regardless of k. The fold lambda evaluates interpreted (no codegen for
`aggregate` HOFs), but it touches only the filtered per-user arrays, which
is orders of magnitude less data than the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    within: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, stage, t_first, t_last) — how far each user got through the
    ordered ``steps`` with at most ``within`` seconds between consecutive
    matched steps. ``stage`` = number of steps completed (0..len(steps));
    greedy earliest matching, which is optimal for chain existence (matching
    a step earlier never prevents a later step from matching).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ts = F.col(ts_col)
    dt = dict(events.dtypes).get(ts_col, "")
    if dt.startswith("timestamp"):
        # NTZ casts to double only via LTZ (session TZ is pinned UTC)
        ts = ts.cast("timestamp").cast("double")
    else:
        ts = ts.cast("double")
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user"),
        ts.alias("__ts"),
        F.col(type_col).alias("__ty"),
    )
    per_user = ev.groupBy("user").agg(
        F.array_sort(F.collect_list(F.struct("__ts", "__ty"))).alias("__seq")
    )
    zero = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast("double").alias("t0"),
        F.lit(None).cast("double").alias("t"),
    )

    def step(acc, e):
        stage = acc["stage"]
        matches = (
            (stage < F.lit(len(steps)))
            & (e["__ty"] == F.element_at(steps_arr, stage + 1))
            & (
                (stage == 0)
                | ((e["__ts"] > acc["t"]) & (e["__ts"] <= acc["t"] + F.lit(within)))
            )
        )
        return F.when(
            matches,
            F.struct(
                (stage + 1).alias("stage"),
                F.coalesce(acc["t0"], e["__ts"]).alias("t0"),
                e["__ts"].alias("t"),
            ),
        ).otherwise(acc)

    walked = per_user.select(
        "user", F.aggregate("__seq", zero, step).alias("__w")
    )
    return walked.select(
        "user",
        F.col("__w.stage").alias("stage"),
        F.col("__w.t0").alias("t_first"),
        F.col("__w.t").alias("t_last"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel report: (step_idx, step, n_users) — users whose ordered walk
    reached at least step_idx (1-based). The per-stage frame is one row per
    user; the report is a k-row rollup of it."""
    st = funnel_stages(events, steps, within, user_col, type_col, ts_col)
    sums = st.agg(
        *[
            F.sum((F.col("stage") >= i + 1).cast("long")).alias(f"__s{i}")
            for i in range(len(steps))
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step"),
                F.coalesce(F.col(f"__s{i}"), F.lit(0)).alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return sums.select(F.explode(pairs).alias("r")).select(
        F.col("r.step_idx").alias("step_idx"),
        F.col("r.step").alias("step"),
        F.col("r.n_users").alias("n_users"),
    )


def retention_cohorts(
    events: DataFrame,
    bucket_seconds: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort, age, n_users) — classic cohort retention: users are cohorted
    by the bucket of their FIRST activity; each later active bucket counts
    them at ``age`` = buckets since cohort. `n_users` at age 0 is the cohort
    size; the ratio n_users(age)/n_users(0) is the retention curve.

    Scale shape: one combining `groupBy(user)` for first-activity, a join
    back on the user key (both sides hash-partitioned by user, so Catalyst
    reuses the exchange), and a combining `groupBy(cohort, age)` with
    `countDistinct(user)` — expanded by Spark into two-stage partial
    aggregation, never a global set. No window functions, no per-user state.
    """
    ts = F.col(ts_col)
    dt = dict(events.dtypes).get(ts_col, "")
    if dt.startswith("timestamp"):
        ts = ts.cast("timestamp").cast("double")
    else:
        ts = ts.cast("double")
    b = (F.floor(ts / bucket_seconds) * bucket_seconds).cast("long")
    ev = events.select(F.col(user_col).alias("user"), b.alias("b")).distinct()
    first = ev.groupBy("user").agg(F.min("b").alias("cohort"))
    aged = ev.join(first, on="user").select(
        "user",
        "cohort",
        ((F.col("b") - F.col("cohort")) / bucket_seconds).cast("long").alias("age"),
    )
    return aged.groupBy("cohort", "age").agg(
        F.countDistinct("user").alias("n_users")
    )
