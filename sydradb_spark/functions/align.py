"""Time-aligned multi-series expressions.

The reference lists "multi-series expressions with alignment" (e.g.
``a.value / b.value``) as an open roadmap item (sydraql-design.md:155,168) —
its Volcano engine has no join. On Spark alignment is a bucket-keyed join:

- ``aligned``: aggregate each side to a common time_bucket grid, then join on
  the bucket. Both sides shuffle on the bucket key once; at scale the smaller
  (coarser/filtered) side broadcasts.
- ``asof_join``: the other classic alignment — each left point picks the
  latest right point at-or-before it (within a tolerance), via union +
  per-series last-observation-carried-forward window rather than a range
  join, so cost is one sort-shuffle, not |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sydradb_spark.functions.timeseries import time_bucket


def bucket_series(points: DataFrame, series: str, step_s: int, out: str) -> DataFrame:
    """One side of an alignment: avg per bucket for one series name."""
    return (
        points.where(F.col("series") == series)
        .groupBy(time_bucket(step_s, F.col("ts")).alias("bucket"))
        .agg(F.avg("value").alias(out))
    )


def aligned(
    points: DataFrame, series_a: str, series_b: str, step_s: int
) -> DataFrame:
    """(bucket, a, b) for buckets where BOTH series have data (inner join —
    the reference design doc never pinned outer semantics).

    ONE scan + ONE shuffle (r15, guide §2.4): both sides are bucket-keyed
    aggregates over the same table, so conditional aggregation computes them
    in a single pass — ``avg`` ignores the NULLs the ``when`` injects for
    the other series' rows, and the per-bucket value sets feeding each avg
    are identical to the two-pass shape's. The inner-join filter is on
    per-series ROW PRESENCE (r16, r15 advice): the r15 shape filtered on
    the avg being non-null, which also dropped a bucket where a series has
    rows but every value is NULL — the two-aggregate inner join (and the
    DuckDB twin) keeps such buckets with a NULL side. Unreachable with
    NULL-free generators, but the count filter is exact either way."""
    both = points.where(F.col("series").isin([series_a, series_b]))
    is_a = F.col("series") == series_a
    is_b = F.col("series") == series_b
    return (
        both.groupBy(time_bucket(step_s, F.col("ts")).alias("bucket"))
        .agg(
            F.avg(F.when(is_a, F.col("value"))).alias("a"),
            F.avg(F.when(is_b, F.col("value"))).alias("b"),
            F.count(F.when(is_a, F.lit(1))).alias("__na"),
            F.count(F.when(is_b, F.lit(1))).alias("__nb"),
        )
        .where((F.col("__na") > 0) & (F.col("__nb") > 0))
        .select("bucket", "a", "b")
    )


def aligned_ratio(
    points: DataFrame, series_a: str, series_b: str, step_s: int
) -> DataFrame:
    return aligned(points, series_a, series_b, step_s).select(
        "bucket", F.try_divide(F.col("a"), F.col("b")).alias("ratio")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    tolerance_s: int | None = None,
    value_col: str = "value",
) -> DataFrame:
    """As-of join: for each left point, the most recent right value at or
    before its ts (optionally within ``tolerance_s``). Both inputs need
    (series_id, ts); the match is per series_id.

    Implementation: tag and union both sides, one window sorted by
    (ts, side) per series carries the last right value forward — a single
    sort within the series partition instead of a range join. Scales with
    |L|+|R| per series; skewed series split by Spark's AQE.
    """
    l = left.select(
        "series_id", "ts", F.col(value_col).alias("__lv"), F.lit(1).alias("__side")
    )
    r = right.select(
        "series_id", "ts", F.col(value_col).alias("__rv"), F.lit(0).alias("__side")
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → "at or before" inclusive;
    # __rv as the tertiary key makes ties among right rows at the same ts
    # deterministic (the max value wins — the carried last() sees it last)
    w = Window.partitionBy("series_id").orderBy("ts", "__side", "__rv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    carried = u.withColumn("__rv_asof", F.last("__rv", ignorenulls=True).over(w))
    carried = carried.withColumn(
        "__rts_asof",
        F.last(F.when(F.col("__side") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    out = carried.where(F.col("__side") == 1)
    if tolerance_s is not None:
        within = F.col("ts") - F.col("__rts_asof") <= tolerance_s
        out = out.withColumn(
            "__rv_asof", F.when(within, F.col("__rv_asof"))
        ).withColumn("__rts_asof", F.when(within, F.col("__rts_asof")))
    return out.select(
        "series_id",
        "ts",
        F.col("__lv").alias("value"),
        F.col("__rv_asof").alias("right_value"),
        F.col("__rts_asof").alias("right_ts"),
    )
