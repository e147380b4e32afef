"""NDJSON ingest — batch and Structured Streaming.

Reference ingest line shape (http.zig:657-712):
``{"series": "...", "ts": <epoch-s>, "value": <f64>, "tags": {...}}``
(tags optional). The reference path is queue → WAL → memtable → hourly
segment flush (engine.zig:263-369); Spark-first that whole pipeline is:

- batch:   ``spark.read.json`` with an explicit schema → identity columns →
           append to the hour-partitioned table.
- stream:  ``readStream.json`` → ``foreachBatch`` append. Exactly-once lands
           on the checkpoint + idempotent batch writes; the WAL is replaced
           by the source's replayability + checkpoint offsets. A
           ``withWatermark`` example lives in the streaming test — the
           reference has NO late-data policy (SURVEY §2.11), late points are
           simply accepted, so no watermark is applied by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from sydradb_spark.model import with_identity
from sydradb_spark.storage import write_points

NDJSON_SCHEMA = StructType(
    [
        StructField("series", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("value", DoubleType(), True),
        StructField("tags", MapType(StringType(), StringType()), True),
    ]
)


def parse_ndjson(raw: DataFrame) -> DataFrame:
    """Normalize parsed NDJSON rows into the canonical points shape:
    missing tags → empty map (identity hashing needs a canonical value)."""
    return with_identity(
        raw.select(
            F.col("series"),
            F.coalesce(F.col("tags"), F.create_map().cast(NDJSON_SCHEMA["tags"].dataType)).alias(
                "tags"
            ),
            F.col("ts").cast("long").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
    )


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """Batch NDJSON → points (CLI stdin / HTTP-batch equivalent)."""
    return parse_ndjson(spark.read.schema(NDJSON_SCHEMA).json(path))


def ingest_batch(spark: SparkSession, ndjson_path: str, table_path: str) -> None:
    write_points(read_ndjson(spark, ndjson_path), table_path, mode="append")


def _checkpoint_app_id(checkpoint_dir: str) -> str:
    """Stable identity for the streaming query, stored INSIDE the checkpoint
    dir so it survives restarts (and travels with the checkpoint if it is
    relocated). Created once with an atomic exclusive link — two racing
    starters converge on one id."""
    import os
    import uuid
    from pathlib import Path

    p = Path(checkpoint_dir)
    p.mkdir(parents=True, exist_ok=True)
    marker = p / "_sydra_app_id"
    if not marker.exists():
        tmp = p / f".appid.{uuid.uuid4().hex}.tmp"
        tmp.write_text(f"stream-{uuid.uuid4().hex}")
        try:
            os.link(tmp, marker)
        except FileExistsError:
            pass  # a concurrent starter won — use theirs
        finally:
            tmp.unlink(missing_ok=True)
    return marker.read_text().strip()


def init_points_table(spark: SparkSession, table_path: str) -> None:
    """Ensure ``table_path`` is a manifested table (empty v1 for a fresh
    path; an existing plain-directory table is upgraded in place by
    committing its current listing). The streaming sink requires a manifest
    BEFORE the first batch so every batch append — including batch 0 — goes
    through the txn-ledgered commit path."""
    from pathlib import Path

    from sydradb_spark import manifest as mf

    Path(table_path).mkdir(parents=True, exist_ok=True)
    if not mf.has_manifest(table_path):
        mf.commit(table_path, mf.data_files(table_path))


def stream_points_sink(
    points: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    maintenance_every: int | None = 256,
    maintenance_keep_versions: int = 8,
    _after_write_hook=None,
    _vacuum_min_age: int = 600,
) -> StreamingQuery:
    """The shared streaming sink: canonical points stream → foreachBatch
    hourly-partitioned append. Every streaming source (file NDJSON, Kafka)
    funnels through this one writer, so exactly-once semantics are pinned in
    one place: the source's replayable offsets + checkpoint give at-least-
    once batch delivery, and the manifest txn ledger keyed by
    ``(app_id, batch_id)`` (manifest.read_txn / commit txn=) makes the
    append idempotent — a foreachBatch replay after a crash in the
    write→checkpoint-commit gap is detected and becomes a no-op, the
    Spark-side twin of the reference's WAL replay-above-highwater guard
    (engine.zig:406-437). Pinned by
    tests/test_streaming.py::test_stream_sink_exactly_once_replay.

    ``available_now=True`` drains what's there and stops (test/cron mode);
    False runs continuously (micro-batch service mode).

    ``maintenance_every=k`` vacuums the table every k batches (keeping
    ``maintenance_keep_versions`` manifest versions plus the usual age
    window): a continuous stream otherwise accumulates one manifest
    version per batch FOREVER, and the commit path's version listing is
    O(versions) — a year at one batch/minute is ~500k version files and a
    quadratic stream lifetime. Appends never unreference data files, so
    the vacuum only prunes old version jsons and crashed-attempt orphans;
    time travel on the stream table is bounded to the kept window.

    ``_after_write_hook(batch_id)`` is a test seam: it runs after the
    durable write but before Spark's checkpoint commit (crash injection);
    ``_vacuum_min_age`` is the vacuum age window (test seam)."""
    from sydradb_spark import manifest as mf

    init_points_table(points.sparkSession, table_path)
    app_id = _checkpoint_app_id(checkpoint_dir)

    def sink(batch: DataFrame, batch_id: int) -> None:
        write_points(batch, table_path, mode="append", txn=(app_id, batch_id))
        if _after_write_hook is not None:
            _after_write_hook(batch_id)
        if maintenance_every and batch_id > 0 and batch_id % maintenance_every == 0:
            mf.vacuum(
                table_path,
                keep_versions=maintenance_keep_versions,
                min_age_seconds=_vacuum_min_age,
            )

    writer = points.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedupe_stream(points: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Suppress producer-retry duplicates at ingest: exact (series_id, ts,
    value) repeats arriving within ``watermark`` of event time are dropped
    by Spark's watermarked dedup state. Beyond the reference (which accepts
    all points and dedups at compaction) — compaction's last-wins stays the
    backstop for duplicates that outlive the watermark, so the two layers
    compose. State size is bounded by the watermark horizon."""
    return (
        points.withColumn("__event_time", F.timestamp_seconds(F.col("ts")))
        .withWatermark("__event_time", watermark)
        .dropDuplicatesWithinWatermark(["series_id", "ts", "value"])
        .drop("__event_time")
    )


def stream_ndjson(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    dedupe_watermark: str | None = None,
) -> StreamingQuery:
    """File-source streaming ingest → the shared points sink; pass
    ``dedupe_watermark`` (e.g. "1 hour") to drop producer-retry duplicates
    within that event-time horizon."""
    raw = spark.readStream.schema(NDJSON_SCHEMA).json(source_dir)
    points = parse_ndjson(raw)
    if dedupe_watermark is not None:
        points = dedupe_stream(points, dedupe_watermark)
    return stream_points_sink(points, table_path, checkpoint_dir, available_now)


def read_csv_points(spark: SparkSession, path: str) -> DataFrame:
    """CSV ingest (reference cmd/sydra-csv is a 1-line placeholder; this is
    the real thing): header ``series,ts,value[,tags]`` with tags as a JSON
    object string."""
    # escape='"' gives RFC-4180 doubled-quote semantics (Spark's default
    # escape is backslash), needed for JSON tag objects inside quoted fields
    raw = spark.read.option("header", "true").option("escape", '"').csv(path)
    tags = (
        F.from_json(F.col("tags"), NDJSON_SCHEMA["tags"].dataType)
        if "tags" in raw.columns
        else F.lit(None).cast(NDJSON_SCHEMA["tags"].dataType)
    )
    return parse_ndjson(
        raw.select(
            F.col("series"),
            F.col("ts").cast("long").alias("ts"),
            F.col("value").cast("double").alias("value"),
            tags.alias("tags"),
        )
    )


def parse_kafka_values(raw: DataFrame) -> DataFrame:
    """Kafka record values (binary NDJSON) → canonical points — the
    transformation half of the Kafka source, testable without a broker."""
    return parse_ndjson(
        raw.select(
            F.from_json(F.col("value").cast("string"), NDJSON_SCHEMA).alias("j")
        ).select("j.*")
    )


def stream_kafka_points(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Kafka → streaming points (SURVEY §7.1 phase 6). Requires the
    spark-sql-kafka package on the classpath at runtime (DEPLOY.md); only
    this ``.format("kafka").load()`` line needs a broker — everything after
    it (parse_kafka_values → stream_points_sink) is pinned end-to-end by
    ``tests/test_streaming.py::test_kafka_chain_end_to_end`` over a
    binary-value file stream shaped exactly like Kafka records."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .load()
    )
    return parse_kafka_values(raw)


def stream_kafka_ingest(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    table_path: str,
    checkpoint_dir: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Kafka → parse → durable hourly-partitioned table: the full ingest
    service, one call. Composition of the two halves the tests pin."""
    return stream_points_sink(
        stream_kafka_points(spark, bootstrap_servers, topic),
        table_path,
        checkpoint_dir,
        available_now,
    )
