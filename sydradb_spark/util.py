"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives in
    fewer splits (e.g. one small parquet file below maxPartitionBytes) —
    otherwise every narrow stage downstream runs single-task. No-op when the
    source already has enough splits (the at-scale case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 64,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``aggs`` maps output name → (partial_agg_expr, final_agg_expr_over_partial),
    e.g. ``{"n": (F.count("*"), F.sum("n")), "mx": (F.max("v"), F.max("mx"))}``
    — the final expr references the partial's output name. Phase 1 groups by
    (keys + random salt) so one hot key spreads over ``salt_buckets``
    reducers; phase 2 folds the (tiny) per-salt partials. Only associative
    aggregates qualify — the same law the rollup table relies on.

    AQE's skew handling covers skewed *joins*; a skewed groupBy still funnels
    one key's rows to one task — this is the standard fix.
    """
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def drop_hot_keys(df: DataFrame, keys: list[str], max_n: int) -> DataFrame:
    """Drop every row whose grouping-key value occurs more than ``max_n``
    times — the hot-bucket guard in front of per-key collect_list + pair
    expansion (LSH buckets, winnowing fingerprints), where one degenerate
    key (boilerplate collapse) would otherwise mean ~max_n² pairs times
    millions.

    Shape is load-bearing at scale: a window count over the keys, NOT a
    count-aggregate joined back. The window shuffles the table once by the
    keys and a following groupBy on the same keys reuses that partitioning
    (its hashpartitioning requirement is already satisfied), the filter
    runs inside the same stage, and there is no join for Catalyst to
    mis-plan — the join-back variant broadcast a multi-million-row size
    frame at 100x data (post-aggregate size estimates land under the
    autoBroadcastJoinThreshold) and OOM'd the driver build.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("__n", F.count(F.lit(1)).over(w))
        .where(F.col("__n") <= max_n)
        .drop("__n")
    )
