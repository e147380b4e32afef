"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives in
    fewer splits (e.g. one small parquet file below maxPartitionBytes) —
    otherwise every narrow stage downstream runs single-task. No-op when the
    source already has enough splits (the at-scale case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
