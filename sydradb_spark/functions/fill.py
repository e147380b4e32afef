"""FILL(previous | linear | null | <constant>) — gap filling over bucketed
aggregates.

The reference parses FILL into its Aggregate node (ast.zig:129-139,
parser.zig:280-320) but never executes it; target semantics are "applied
post-aggregation per group-by bucket" (sydraql-design.md:77-81,138).

Spark recipe (SURVEY §2.9): build the dense bucket spine with
``sequence(min_bucket, max_bucket, step)`` + ``explode`` per group, left-join
the aggregated result, then patch nulls per strategy. The spine bounds are
the min/max bucket *present per group* (the reference never decided bounds —
documented choice).

Scale note: the spine is generated per-group from that group's own min/max,
so a group spanning N buckets adds exactly N rows — no cross-product with a
global range. The join is on (group keys + bucket); with AQE it broadcasts
when the aggregated side is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MAX_SPINE_BUCKETS = 10_000_000  # guard: refuse to densify absurd ranges


def fill_buckets(
    agg: DataFrame,
    bucket_col: str,
    step_s: int,
    keys: list[str],
    value_cols: list[str],
    strategy: str,
    constant: object | None = None,
) -> DataFrame:
    """Densify ``agg`` on ``bucket_col`` (epoch-second longs, step ``step_s``)
    and fill nulls in ``value_cols`` per ``strategy``.

    strategy: "null" | "constant" | "previous" | "linear"
    """
    if strategy not in ("null", "constant", "previous", "linear"):
        raise ValueError(f"unknown fill strategy {strategy!r}")

    other_cols = [c for c in agg.columns if c not in value_cols and c != bucket_col and c not in keys]

    bounds = agg.groupBy(*keys).agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    spine = bounds.where(
        ((F.col("__mx") - F.col("__mn")) / step_s) < MAX_SPINE_BUCKETS
    ).select(
        *keys,
        F.explode(F.sequence(F.col("__mn"), F.col("__mx"), F.lit(step_s))).alias(bucket_col),
    )
    joined = spine.join(agg, on=[*keys, bucket_col], how="left")

    if strategy == "null":
        return joined
    if strategy == "constant":
        return joined.select(
            *keys,
            bucket_col,
            *[F.coalesce(F.col(c), F.lit(constant)).alias(c) for c in value_cols],
            *other_cols,
        )

    w = Window.partitionBy(*keys).orderBy(bucket_col) if keys else Window.orderBy(bucket_col)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)

    if strategy == "previous":
        return joined.select(
            *keys,
            bucket_col,
            *[F.last(F.col(c), ignorenulls=True).over(back).alias(c) for c in value_cols],
            *other_cols,
        )

    # linear: lerp between the last and next non-null sample of each column.
    out_cols: list[Column] = []
    for c in value_cols:
        v = F.col(c)
        prev_v = F.last(v, ignorenulls=True).over(back)
        prev_b = F.last(F.when(v.isNotNull(), F.col(bucket_col)), ignorenulls=True).over(back)
        next_v = F.first(v, ignorenulls=True).over(fwd)
        next_b = F.first(F.when(v.isNotNull(), F.col(bucket_col)), ignorenulls=True).over(fwd)
        lerp = prev_v + (next_v - prev_v) * (F.col(bucket_col) - prev_b) / (next_b - prev_b)
        out_cols.append(F.when(v.isNotNull(), v).otherwise(lerp).alias(c))
    return joined.select(*keys, bucket_col, *out_cols, *other_cols)
