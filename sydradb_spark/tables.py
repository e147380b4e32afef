"""Loaders for the driver's test tables (/root/testdata/sf*, TESTDATA.md).

``events`` plays the role of the reference's points stream (FIXTURES.md §F5):
event_type → series metric, event timestamp → epoch-second ts, value → value.
The parquet stores TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong`` Spark reads it as long nanoseconds,
normalized here to both an epoch-second long (``ts_s``) and a micros
timestamp (``ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects
        # unless read as long nanoseconds; the driver's session may not have
        # set this, so set it at runtime (it is a dynamic SQLConf).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events(df)
    return df


def normalize_events(df: DataFrame) -> DataFrame:
    ts_field = df.schema["ts"]
    if isinstance(ts_field.dataType, LongType):
        # long nanoseconds (nanosAsLong) → epoch seconds + micros timestamp.
        # Integer division: epoch-ns (~1.7e18) exceeds double's 53-bit exact
        # range, so float division can be off by one near boundaries.
        # ``__ns`` keeps the RAW parquet column alive under an alias: Catalyst
        # cannot invert ``ts div 1e9 >= lo`` into a scan predicate, but a
        # redundant bound on ``__ns`` pushes straight through the rename to
        # the Parquet reader (PushedFilters), so time-ranged queries skip
        # row groups instead of full-scanning events.parquet.
        df = (
            df.withColumn("__ns", F.col("ts"))
            .withColumn("ts_s", F.expr("ts div 1000000000"))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    else:
        df = df.withColumn("ts_s", F.col("ts").cast("long"))
    return df


def events_points(spark: SparkSession, sf_dir: str, with_seq: bool = False) -> DataFrame:
    """events → canonical points table (FIXTURES.md §F5 mapping).

    Series = ``events.<event_type>``; tags ``host`` (5 values, from user_id%5)
    and ``dc`` (2 values, from user_id%2) — two tag keys so tag-find AND/OR
    is meaningful. ``with_seq=True`` carries ``event_id`` as an ingest-order
    column ``seq`` for last-wins compaction (reference compact.zig:36-49).
    """
    from sydradb_spark.model import with_identity

    ev = load_table(spark, sf_dir, "events")
    cols = [
        F.concat(F.lit("events."), F.col("event_type")).alias("series"),
        F.create_map(
            F.lit("host"),
            F.concat(F.lit("h"), (F.col("user_id") % 5).cast("string")),
            F.lit("dc"),
            F.concat(F.lit("dc"), (F.col("user_id") % 2).cast("string")),
        ).alias("tags"),
        F.col("ts_s").alias("ts"),
        F.col("value").cast("double").alias("value"),
    ]
    extra: list[str] = []
    if with_seq:
        cols.append(F.col("event_id").alias("seq"))
        extra.append("seq")
    if "__ns" in ev.columns:
        # raw-nanos pushdown hint (normalize_events): the translator rewrites
        # ts bounds onto this column so they reach the Parquet scan.
        cols.append(F.col("__ns"))
        extra.append("__ns")
    # no spread() here: the events adapter feeds shuffle-bearing queries
    # (agg/window/sort) whose exchange redistributes anyway; an up-front
    # repartition of the single-file input just adds a shuffle.
    return with_identity(ev.select(*cols), extra=extra or None)
