"""Native event-time windowed aggregation with watermark-bounded state.

This is the canonical Structured Streaming shape (groupBy(window(...)) +
withWatermark): Spark keeps per-window state only until the watermark passes
the window end, then drops rows arriving later. That is a DIFFERENT contract
from the reference's (which accepts any late point into the memtable,
engine.zig:327-331 — our ingest.stream_ndjson + rollup_stream keep that
behavior); this module is the bounded-state alternative for feeds where
late data should be cut off rather than compacted in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    points_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-(series_id, window) aggregates. Input needs
    (series_id, ts, value); output one row per closed-or-updated window with
    the same statistics shape as rollup partials (fold-compatible)."""
    pts = points_stream.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
    w = F.window("event_time", window)
    return (
        pts.withWatermark("event_time", watermark)
        .groupBy(F.col("series_id"), w.alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("value").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .select(
            "series_id",
            F.unix_timestamp(F.col("w.start")).alias("bucket"),
            "cnt",
            "sum_v",
            "min_v",
            "max_v",
        )
    )


def sessionize(
    points: DataFrame,
    gap_s: int = 600,
    watermark: str | None = None,
) -> DataFrame:
    """Per-series session windows via native ``F.session_window`` — one
    declarative implementation that runs identically in batch and in
    Structured Streaming (pass ``watermark`` for streams; state for a
    session is dropped once the watermark passes its close).

    A session groups consecutive events whose gaps are <= ``gap_s``; the
    window end is last_event + gap, and windows that TOUCH merge —
    next.start <= prev.end — so the gaps-and-islands oracle mirrors it with
    ``diff > gap → new island``.
    Input needs (series, ts epoch-s, value); output one row per session.

    Scale: this is a single keyed aggregation — Spark merges overlapping
    per-row windows during the shuffle (partial merge map-side), so cost is
    one shuffle on series, state bounded by open sessions × series. The
    beyond-reference op a telemetry store needs for user/device activity
    segmentation.
    """
    pts = points.withColumn("event_time", F.timestamp_seconds(F.col("ts")))
    if watermark is not None:
        pts = pts.withWatermark("event_time", watermark)
    return (
        pts.groupBy(
            F.col("series"),
            F.session_window("event_time", f"{gap_s} seconds").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_v"),
        )
        .select(
            "series",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            F.unix_timestamp(F.col("w.end")).alias("session_end"),
            "n_events",
            "sum_v",
        )
    )
