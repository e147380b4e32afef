"""Event-sequence analytics over the events table
``(user_id long, event_type string, ts, ...)`` — funnel conversion.

Scale design: ONE shuffle. Events are filtered to the funnel's step types
at the scan (predicate pushdown on `event_type`), grouped per user, and the
exact per-user DP runs as an Arrow-batched kernel over each user's (small)
event array. The alternative — one join per funnel step — costs k shuffles
and re-materializes the user set each step; the kernel costs one
`groupBy(user)` regardless of k and touches only the filtered per-user
arrays, orders of magnitude less data than the scan.
"""

from __future__ import annotations

import logging

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# hot-key guard default: one bot/crawler user with 10^7+ events would
# otherwise land its whole sequence in one collect_list array on one task.
# 1M matching events per user is far beyond any human session while staying
# immaterial at check scale; pass max_events_per_user=None to disable.
DEFAULT_MAX_EVENTS_PER_USER = 1_000_000

_pickle_by_value_registered = False


def _register_pickle_by_value() -> None:
    """Ship this module's code with UDF closures (cloudpickle>=2.0 /
    pyspark>=3.3) so workers never need sydradb_spark importable on their
    sys.path. Guarded: registration is a process-global cloudpickle side
    effect, so it runs once rather than on every funnel call."""
    global _pickle_by_value_registered
    if _pickle_by_value_registered:
        return
    from pyspark import cloudpickle

    import sydradb_spark.pipeline.events as _events_mod

    cloudpickle.register_pickle_by_value(_events_mod)
    _pickle_by_value_registered = True


def _funnel_dp(seq, steps: list[str], within: float):
    """Exact per-user funnel DP. ``seq`` is the ts-ascending (ts, type)
    list. dp[i] holds the two largest DISTINCT last-matched timestamps for
    "reached stage i" — two suffice: when extending with an event at ts,
    the best predecessor is the largest recorded t < ts (events ascend, so
    ties can only sit at the current maximum), and larger t maximizes the
    t + within upper bound. A greedy single-path walk is NOT exact here:
    with a per-step gap window, a stalled early attempt must not block a
    later restart (a@0, a@95, b@100, within=10 reaches stage 2 via a@95).
    A step type may appear at multiple positions (steps=['view','click',
    'view']): each event is applied to EVERY position whose step matches,
    in descending position order; the strict ``prev < ts`` predecessor
    check means an event can never chain with itself across two adjacent
    positions of the same type. Returns (stage, t_first, t_last)."""
    k = len(steps)
    step_pos: dict[str, list[int]] = {}
    for i, s in enumerate(steps):
        step_pos.setdefault(s, []).append(i)
    NEG = float("-inf")
    dp = [[NEG, NEG] for _ in range(k + 1)]  # [max, second-max-distinct]
    t_first = None
    for ts, ty in seq:
        idxs = step_pos.get(ty)
        if idxs is None:
            continue
        for i in reversed(idxs):
            if i == 0:
                if t_first is None:
                    t_first = ts
                best = ts
            else:
                m1, m2 = dp[i]
                prev = m1 if m1 < ts else m2  # largest recorded t strictly < ts
                best = ts if (prev != NEG and ts <= prev + within) else None
            if best is not None:
                m1, m2 = dp[i + 1]
                if best > m1:
                    dp[i + 1] = [best, m1]
                elif best != m1 and best > m2:
                    dp[i + 1] = [m1, best]
    stage = 0
    for i in range(k, 0, -1):
        if dp[i][0] != NEG:
            stage = i
            break
    t_last = dp[stage][0] if stage else None
    return stage, t_first, t_last


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    within: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_events_per_user: int | None = DEFAULT_MAX_EVENTS_PER_USER,
) -> DataFrame:
    """(user, stage, t_first, t_last, truncated) — the deepest stage each
    user reached through the ordered ``steps`` with at most ``within``
    seconds between consecutive matched steps (exact: any event subsequence
    counts, so a stalled attempt never blocks a later restart). ``t_first``
    is the first step-1 match, ``t_last`` the last-matched timestamp of the
    deepest stage. Repeated step types are supported (each event feeds
    every matching position). The per-user DP is inherently sequential →
    Arrow-batched kernel over the per-user event arrays (same
    justification as winnowing); the job's distributed cost stays the
    single groupBy(user).

    ``max_events_per_user`` is the hot-key guard for corpus scale: one bot
    user with 10^7 events would otherwise land its whole sequence in one
    collect_list array on one task. ON BY DEFAULT (1M — far beyond any
    human session; None disables): only the EARLIEST N matching events per
    user enter the DP (row_number window — the sort spills to disk, and
    the window's hash partitioning is reused by the groupBy, so the job
    still costs one shuffle). Semantics under truncation: stages reached
    only via events past the cap are undercounted for that user — the
    funnel stays exact for every user within the cap, and the per-user
    ``truncated`` verdict column makes capped users observable
    (``sum(truncated)`` is the no-op detector, same discipline as
    semantic_dedup's bypass column)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1")
    _register_pickle_by_value()
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField as SF,
        StructType as ST,
    )

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
    if max_events_per_user is not None:
        from pyspark.sql.window import Window

        # ADAPTIVE guard: pay for the expensive per-user sort window only
        # where it can bind. A map-side-combining count finds users over
        # the cap (only distinct users cross the wire); that set is tiny by
        # construction (a >1M-event key is a bot, not a population), so it
        # broadcasts, the cold majority skips straight to the groupBy with
        # NO window sort at all, and only hot users' rows are sorted and
        # capped. With zero hot users — the normal case — the guard costs
        # one cheap count aggregation instead of a full event sort.
        hot = (
            ev.groupBy("user")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > max_events_per_user)
            .select("user")
        )
        cold = ev.join(F.broadcast(hot), on="user", how="left_anti").withColumn(
            "__trunc", F.lit(False)
        )
        w = Window.partitionBy("user").orderBy("__ts", "__ty")
        capped = (
            ev.join(F.broadcast(hot), on="user", how="left_semi")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_events_per_user)
            .drop("__rn")
            .withColumn("__trunc", F.lit(True))
        )
        ev = cold.unionByName(capped)
        log.info(
            "funnel_stages: hot-user cap active at %d matching events/user; "
            "capped users carry truncated=true in the output",
            max_events_per_user,
        )
    else:
        ev = ev.withColumn("__trunc", F.lit(False))
    per_user = ev.groupBy("user").agg(
        F.array_sort(F.collect_list(F.struct("__ts", "__ty"))).alias("__seq"),
        F.max("__trunc").alias("truncated"),
    )
    steps_l, within_f = list(steps), float(within)
    out_t = ST(
        [
            SF("stage", IntegerType()),
            SF("t_first", DoubleType()),
            SF("t_last", DoubleType()),
        ]
    )

    # the UDF closure references module-level _funnel_dp, which cloudpickle
    # serializes BY REFERENCE (re-imported on the Python worker) — that
    # works only while the worker's sys.path can resolve sydradb_spark
    # (e.g. driver cwd == repo root). A harness that imports
    # __spark_entry__ from elsewhere gets ModuleNotFoundError on the
    # worker (found by the default-session driver simulation, round 10).
    # _register_pickle_by_value (called above, once per process) ships the
    # DP with the closure and removes the deployment assumption.
    @pandas_udf(out_t)
    def _walk(seqs: pd.Series) -> pd.DataFrame:
        rows = [
            _funnel_dp([(e["__ts"], e["__ty"]) for e in s], steps_l, within_f)
            for s in seqs
        ]
        return pd.DataFrame(rows, columns=["stage", "t_first", "t_last"])

    walked = per_user.select(
        "user", _walk(F.col("__seq")).alias("__w"), "truncated"
    )
    return walked.select(
        "user",
        F.col("__w.stage").cast("int").alias("stage"),
        F.col("__w.t_first").alias("t_first"),
        F.col("__w.t_last").alias("t_last"),
        "truncated",
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within: float,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_events_per_user: int | None = DEFAULT_MAX_EVENTS_PER_USER,
) -> DataFrame:
    """Funnel report: (step_idx, step, n_users) — users whose ordered walk
    reached at least step_idx (1-based). The per-stage frame is one row per
    user; the report is a k-row rollup of it."""
    st = funnel_stages(
        events, steps, within, user_col, type_col, ts_col, max_events_per_user
    )
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
