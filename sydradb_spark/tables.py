"""Loaders for the driver's test tables (/root/testdata/sf*, TESTDATA.md).

``events`` plays the role of the reference's points stream (FIXTURES.md §F5):
event_type → series metric, event timestamp → epoch-second ts, value → value.
The parquet's ``ts`` physical type has drifted across driver runs —
TIMESTAMP(NANOS) in rounds 2-3, TIMESTAMP(MICROS) since round 4 — so
``normalize_events`` handles BOTH: nanos are read as long via
``spark.sql.legacy.parquet.nanosAsLong`` (harmless when the column is
micros); micros arrive as TIMESTAMP_NTZ and are interpreted as UTC
wall-clock (matching DuckDB's naive-UTC ``epoch_ns``). Either way the
output carries an epoch-second long (``ts_s``) plus the RAW parquet
column under an alias (``__ns`` long-nanos / ``__tsr`` timestamp) so the
translator can push time bounds down to the parquet scan.
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
        # If events.parquet stores TIMESTAMP(NANOS), Spark's reader rejects it
        # unless read as long nanoseconds; the driver's session may not have
        # set this, so set it at runtime (it is a dynamic SQLConf; no-op when
        # the column is micros). UTC session tz makes the NTZ→LTZ cast in
        # normalize_events interpret naive timestamps as UTC, matching the
        # DuckDB oracle's epoch_ns semantics.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events(df, _long_ts_units_per_s(f"{sf_dir}/{name}.parquet"))
    return df


def _long_ts_units_per_s(path: str) -> int:
    """Units-per-second for a LONG ``ts`` read, inferred from the parquet
    footer statistics (no data read). The testdata's ts physical type has
    already drifted once (nanos → micros); if it ever becomes a PLAIN int64
    epoch column, a fixed div-by-1e9 would silently produce garbage. For a
    real TIMESTAMP column the stats are datetimes and the comparison below
    raises, falling back to nanoseconds — exactly right, since a long read
    of a timestamp column only happens via nanosAsLong."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().get_field_index("ts")
        mx = md.row_group(0).column(idx).statistics.max
        for ups in (1, 1_000, 1_000_000, 1_000_000_000):
            if mx < 4_000_000_000 * ups:  # < year ~2096 in this unit
                return ups
    except Exception:
        pass
    return 1_000_000_000


def normalize_events(df: DataFrame, long_units_per_s: int = 1_000_000_000) -> DataFrame:
    ts_field = df.schema["ts"]
    if isinstance(ts_field.dataType, LongType) and long_units_per_s != 1_000_000_000:
        # plain int64 epoch column in s/ms/µs: correct ts_s, no raw-column
        # pushdown hint (the translator's redundant bound is nanos-scaled;
        # losing row-group pruning beats losing correctness, and this shape
        # has never shipped in the testdata).
        return df.withColumn("ts_s", F.expr(f"ts div {long_units_per_s}"))
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
        # TIMESTAMP(MICROS) parquet → TIMESTAMP_NTZ (or TIMESTAMP when the
        # session maps NTZ to LTZ). A direct cast timestamp→long is
        # disallowed in Spark 4; go through a TIMESTAMP cast (exact under the
        # UTC session tz set by load_table) + unix_seconds. ``__tsr`` keeps
        # the RAW parquet column alive so the translator's redundant time
        # bound pushes to the scan (same trick as ``__ns`` for nanos).
        df = (
            df.withColumn("__tsr", F.col("ts"))
            .withColumn("ts_s", F.unix_seconds(F.col("ts").cast("timestamp")))
        )
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
    # __ssrc pushdown hint: the RAW parquet column behind the series suffix
    # (invariant: __ssrc == series after the first '.'). Catalyst cannot
    # invert the series concat, so a series-equality filter alone never
    # reaches the scan; the translator adds a redundant equality on __ssrc,
    # which pushes as EqualTo(event_type, ...) and lets the scan skip other
    # event types' row groups — at 100 TB with k event types that is a ~k×
    # decode reduction for single-series queries.
    cols.append(F.col("event_type").alias("__ssrc"))
    extra.append("__ssrc")
    for raw in ("__ns", "__tsr"):
        if raw in ev.columns:
            # raw-ts pushdown hint (normalize_events): the translator rewrites
            # ts bounds onto this column so they reach the Parquet scan.
            cols.append(F.col(raw))
            extra.append(raw)
    # no spread() here: the events adapter feeds shuffle-bearing queries
    # (agg/window/sort) whose exchange redistributes anyway; an up-front
    # repartition of the single-file input just adds a shuffle.
    return with_identity(ev.select(*cols), extra=extra or None)
