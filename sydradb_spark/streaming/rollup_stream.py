"""Streaming rollup maintenance.

Pattern: NDJSON stream → watermark on event time → per-micro-batch partial
rollups written to a BATCH-DETERMINISTIC subdirectory of the rollup table
(``b_<batch_id>/``, mode=overwrite). Readers (or a periodic compaction)
fold the partials with ``rollup.combine_rollup`` — every rollup statistic
is associative, so write-then-fold needs no read-modify-write races.

Exactly-once (r11 — this sink previously had the same replay hole the
points sink did, VERDICT r10 finding 1): the write target is a pure
function of ``batch_id`` and the write mode is overwrite, so a
foreachBatch replay after a crash in the write→checkpoint-commit gap
OVERWRITES its own output instead of appending a second copy — the fold
counts each batch exactly once. Compaction preserves that guarantee by
never folding the newest batch directory (the only batch Spark can still
replay); see ``compact_rollup``.

The watermark bounds state for Spark's own windowed mode; here aggregation
happens inside foreachBatch (per-batch partials), so the watermark's role is
to document/enforce the allowed lateness contract on the stream — late rows
beyond it still land (reference semantics: late points are simply accepted,
engine.zig:327-331) but monitoring can alert on them.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sydradb_spark.ingest import NDJSON_SCHEMA, parse_ndjson
from sydradb_spark.rollup import ROLLUP_COLS, build_rollup, combine_rollup


def _batch_dir(rollup_path: str, batch_id: int) -> str:
    return f"{rollup_path.rstrip('/')}/b_{batch_id:012d}"


def write_rollup_batch(
    partial: DataFrame, rollup_path: str, batch_id: int
) -> None:
    """Idempotent per-batch partial write: deterministic target + overwrite
    means a replayed batch converges instead of double-counting."""
    partial.write.mode("overwrite").parquet(_batch_dir(rollup_path, batch_id))


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

    def sink(batch: DataFrame, batch_id: int) -> None:
        partial = build_rollup(batch.drop("__event_time"), step_s=step_s)
        write_rollup_batch(partial, rollup_path, batch_id)

    writer = pts.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _read_partials(spark: SparkSession, rollup_path: str) -> DataFrame:
    # recursiveFileLookup: the table mixes top-level compacted files with
    # b_* batch subdirs; plain partition discovery would reject the mix
    return (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(rollup_path)
        .select(*ROLLUP_COLS)
    )


def read_rollup(spark: SparkSession, rollup_path: str, step_s: int) -> DataFrame:
    """Fold the partials into the canonical one-row-per-bucket rollup."""
    return combine_rollup(_read_partials(spark, rollup_path), step_s)


def compact_rollup(spark: SparkSession, rollup_path: str, step_s: int) -> None:
    """Periodic job: rewrite the partials as folded rows (rename-before-
    remove swap — the old rollup stays recoverable through a mid-swap
    crash, storage._swap_dir).

    The NEWEST batch directory is carried through UNFOLDED: it is the only
    batch a restarted stream can still replay (older batches' commits are
    in the checkpoint), and folding it would let the replay's overwrite
    re-add what the fold already counted. Run alongside a live stream the
    usual offline-maintenance caveat applies: a batch that starts writing
    mid-compaction is lost with the swap."""
    import shutil

    root = Path(rollup_path)
    batch_dirs = sorted(p for p in root.glob("b_*") if p.is_dir())
    live = batch_dirs[-1] if batch_dirs else None
    srcs = [
        str(p)
        for p in root.iterdir()
        if p != live and (p.is_dir() or p.suffix == ".parquet")
    ]
    if not srcs:
        return
    folded = combine_rollup(
        spark.read.option("recursiveFileLookup", "true")
        .parquet(*srcs)
        .select(*ROLLUP_COLS),
        step_s,
    )
    from sydradb_spark.storage import _swap_dir

    tmp = rollup_path.rstrip("/") + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.write.mode("overwrite").parquet(tmp)
    if live is not None:
        shutil.copytree(live, Path(tmp) / live.name)
    _swap_dir(Path(tmp), root)
