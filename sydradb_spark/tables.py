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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events(df)
    return df


def normalize_events(df: DataFrame) -> DataFrame:
    ts_field = df.schema["ts"]
    if isinstance(ts_field.dataType, LongType):
        # long nanoseconds (nanosAsLong) → epoch seconds + micros timestamp
        df = df.withColumn("ts_s", (F.col("ts") / 1_000_000_000).cast("long")).withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    else:
        df = df.withColumn("ts_s", F.col("ts").cast("long"))
    return df


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical points table (FIXTURES.md §F5 mapping)."""
    from sydradb_spark.model import with_identity

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.concat(F.lit("events."), F.col("event_type")).alias("series"),
        F.create_map(
            F.lit("host"), F.concat(F.lit("h"), (F.col("user_id") % 5).cast("string"))
        ).alias("tags"),
        F.col("ts_s").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    return with_identity(base)
