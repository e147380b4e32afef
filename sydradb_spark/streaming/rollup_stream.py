"""Streaming rollup maintenance.

Pattern: NDJSON stream → watermark on event time → per-micro-batch partial
rollups APPENDED to the rollup table. Readers (or a periodic compaction)
fold duplicates with ``rollup.combine_rollup`` — every rollup statistic is
associative, so append-then-fold gives exactly-once *semantics* without
read-modify-write races, and the write path stays an append (cheap, atomic
per file, no partition rewrites in the hot path).

The watermark bounds state for Spark's own windowed mode; here aggregation
happens inside foreachBatch (per-batch partials), so the watermark's role is
to document/enforce the allowed lateness contract on the stream — late rows
beyond it still land (reference semantics: late points are simply accepted,
engine.zig:327-331) but monitoring can alert on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sydradb_spark.ingest import NDJSON_SCHEMA, parse_ndjson
from sydradb_spark.rollup import ROLLUP_COLS, build_rollup, combine_rollup


def stream_rollup(
    spark: SparkSession,
    source_dir: str,
    rollup_path: str,
    checkpoint_dir: str,
    step_s: int = 3600,
    watermark: str = "1 hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain an hourly rollup from an NDJSON point stream."""
    raw = spark.readStream.schema(NDJSON_SCHEMA).json(source_dir)
    pts = parse_ndjson(raw).withColumn(
        "__event_time", F.timestamp_seconds(F.col("ts"))
    ).withWatermark("__event_time", watermark)

    def sink(batch: DataFrame, _batch_id: int) -> None:
        partial = build_rollup(batch.drop("__event_time"), step_s=step_s)
        partial.write.mode("append").parquet(rollup_path)

    writer = pts.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(spark: SparkSession, rollup_path: str, step_s: int) -> DataFrame:
    """Fold appended partials into the canonical one-row-per-bucket rollup."""
    return combine_rollup(spark.read.parquet(rollup_path).select(*ROLLUP_COLS), step_s)


def compact_rollup(spark: SparkSession, rollup_path: str, step_s: int) -> None:
    """Periodic job: rewrite the append-only partials as folded rows
    (rename-before-remove swap — the old rollup stays recoverable through
    a mid-swap crash, storage._swap_dir)."""
    from pathlib import Path

    from sydradb_spark.storage import _swap_dir

    folded = read_rollup(spark, rollup_path, step_s)
    tmp = rollup_path.rstrip("/") + ".compact.tmp"
    folded.write.mode("overwrite").parquet(tmp)
    _swap_dir(Path(tmp), Path(rollup_path))
