"""Streaming corpus intake: the online half of the curation pipeline.

A training corpus is rarely collected in one batch — crawl output arrives
continuously. This module applies the cheap curation stages *at ingest
time* so the landed corpus needs only the expensive (near-dup) stages at
training-prep time:

- **quality gate** — the same closed-form `text.quality_score` as batch
  (pure column expressions; stateless map, no shuffle per micro-batch);
- **exact dedup** — `dropDuplicatesWithinWatermark` on the content md5:
  a re-crawled page arriving within the event-time watermark lands once.
  State is bounded by the watermark horizon; duplicates that outlive it
  are caught by the batch `exact_dedup` at training-prep (the same
  two-layer contract as `ingest.dedupe_stream` + compaction last-wins).

Semantics note vs batch: batch `exact_dedup` keeps the MIN doc_id of a
duplicate set; the stream keeps the FIRST-ARRIVING copy. Identical when
ids arrive in order — the streaming guarantee is "at most one copy per
content hash per watermark window", not a specific keeper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sydradb_spark.pipeline.text import quality_score


def curate_stream(
    docs: DataFrame,
    min_quality: float = 0.3,
    dedupe_watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
    text_col: str = "text",
) -> DataFrame:
    """Quality-gate + watermark-dedup a STREAMING documents frame.

    ``docs`` must carry an event-time column ``ts_col`` (epoch seconds,
    long) — crawl/ingest time. Output adds a ``quality`` column and drops
    sub-threshold and duplicate-content rows. Works identically on a batch
    frame (dropDuplicatesWithinWatermark degrades to dropDuplicates), which
    is what the batch-equivalence test pins.
    """
    scored = docs.withColumn("quality", quality_score(F.col(text_col)))
    gated = scored.where(F.col("quality") >= min_quality)
    fp = gated.withColumn("__fp", F.md5(F.col(text_col)))
    if fp.isStreaming:
        out = (
            fp.withColumn("__event_time", F.timestamp_seconds(F.col(ts_col)))
            .withWatermark("__event_time", dedupe_watermark)
            .dropDuplicatesWithinWatermark(["__fp"])
            .drop("__event_time")
        )
    else:
        out = fp.dropDuplicates(["__fp"])
    return out.drop("__fp")
