"""Driver-contract entries for lifecycle operators: storage round-trips,
compaction, retention, tag find, NDJSON ingest, durable INSERT/DELETE.

Entries that write use per-sf scratch dirs under the repo (recreated each
run → idempotent; the driver may invoke any entry repeatedly).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sydradb_spark import storage, tagindex
from sydradb_spark.contract.base import D3, D7, MID, T0, T1, oracle, r6
from sydradb_spark.ingest import ingest_batch
from sydradb_spark.sydraql.engine import SydraQLEngine
from sydradb_spark.tables import events_points

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "_scratch")


def _q(name: str, fn, sql: str | None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


def _scratch(sf_dir: str, tag: str, fresh: bool = False) -> str:
    path = os.path.join(SCRATCH, f"{tag}_{os.path.basename(sf_dir.rstrip('/'))}")
    if fresh and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(SCRATCH, exist_ok=True)
    return path


# --- storage write → pruned scan → aggregate ---------------------------------
def _storage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch(sf_dir, "points")
    pts = events_points(spark, sf_dir).where(F.col("ts") < D7)
    storage.write_points(pts, path, mode="overwrite")
    scanned = storage.scan_range(spark, path, start=T0, end=D3 - 1)
    return scanned.agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_v")
    )


_q(
    "storage_roundtrip",
    _storage_roundtrip,
    oracle(
        f"SELECT count(*) AS n, {r6('sum(value)')} AS sum_v FROM points "
        f"WHERE ts >= {T0} AND ts <= {D3 - 1}"
    ),
)


# --- compaction: (series_id, ts) last-wins by ingest seq ---------------------
def _compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir, with_seq=True)
    compacted = storage.compact_points(pts, order_col="seq")
    return (
        compacted.where(F.col("series") == "events.click")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_v"))
    )


_q(
    "compact_last_wins",
    _compact,
    oracle(
        f""", kept AS (
  SELECT series, host, dc, ts, arg_max(value, seq) AS value
  FROM points GROUP BY 1, 2, 3, 4
)
SELECT count(*) AS n, {r6('sum(value)')} AS sum_v FROM kept
WHERE series = 'events.click'"""
    ),
)


# --- retention: per-namespace TTL --------------------------------------------
def _retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir)
    kept = storage.apply_retention(pts, now_epoch=T1, ttl_days={"events": 10}, default_days=30)
    return kept.groupBy("series").agg(F.count("*").alias("n"))


_q(
    "retention_days",
    _retention,
    oracle(
        f"SELECT series, count(*) AS n FROM points "
        f"WHERE {T1} - ((ts // 3600) * 3600 + 3600) <= {10 * 86400} GROUP BY 1"
    ),
)


# --- tag find ----------------------------------------------------------------
def _find(mode: str, match: dict[str, str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        pts = events_points(spark, sf_dir)
        found = tagindex.find_series(pts, match, mode=mode)
        return found.select(
            "series",
            F.col("tags")["host"].alias("host"),
            F.col("tags")["dc"].alias("dc"),
        )

    return run


def _tag_index_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = events_points(spark, sf_dir)
    idx = tagindex.tag_index(pts)
    return idx.select("tag_kv", F.size("series_ids").alias("n_series"))


_q(
    "tag_index_counts",
    _tag_index_counts,
    oracle(
        """, pairs AS (
  SELECT 'host=' || host AS tag_kv, series, host, dc FROM points
  UNION ALL
  SELECT 'dc=' || dc AS tag_kv, series, host, dc FROM points
)
SELECT tag_kv, CAST(count(DISTINCT (series, host, dc)) AS INTEGER) AS n_series
FROM pairs GROUP BY 1"""
    ),
)

def _tag_find_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND and OR find over the inverted tag index, one labeled union."""
    a = _find("and", {"host": "h1", "dc": "dc1"})(spark, sf_dir)
    o = _find("or", {"host": "h0", "dc": "dc1"})(spark, sf_dir)
    return a.select(F.lit("and").alias("mode"), "series", "host", "dc").unionByName(
        o.select(F.lit("or").alias("mode"), "series", "host", "dc")
    )


_q(
    "tag_find_and_or",
    _tag_find_and_or,
    oracle(
        """SELECT 'and' AS mode, series, host, dc FROM (
  SELECT DISTINCT series, host, dc FROM points WHERE host = 'h1' AND dc = 'dc1')
UNION ALL
SELECT 'or', series, host, dc FROM (
  SELECT DISTINCT series, host, dc FROM points WHERE host = 'h0' OR dc = 'dc1')"""
    ),
)

# --- NDJSON ingest → storage → query round-trip ------------------------------
_NDJSON_ROWS = [
    '{"series": "weather.room1", "ts": 1694300000, "value": 24.2}',
    '{"series": "weather.room1", "ts": 1694300010, "value": 24.3, "tags": {"host": "a"}}',
    '{"series": "weather.room1", "ts": 1694300020, "value": 24.4, "tags": {"host": "a"}}',
    '{"series": "cpu.total", "ts": 1694300000, "value": 1.5, "tags": {"host": "a"}}',
    '{"series": "cpu.total", "ts": 1694303600, "value": 2.25, "tags": {"host": "a"}}',
]


_CSV_ROWS = [
    "series,ts,value,tags",
    'pressure.p1,1694300000,101.3,"{""host"": ""a""}"',
    "pressure.p1,1694300060,101.4,",
]


def _ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON (the reference HTTP/CLI ingest format) and CSV ingest into the
    same stored table, queried back — one labeled union."""
    from sydradb_spark.ingest import read_csv_points
    from sydradb_spark.storage import write_points

    src = _scratch(sf_dir, "ndjson_src", fresh=True)
    csv_src = _scratch(sf_dir, "csv_src", fresh=True)
    table = _scratch(sf_dir, "ndjson_table", fresh=True)
    os.makedirs(src)
    os.makedirs(csv_src)
    with open(os.path.join(src, "batch1.ndjson"), "w") as f:
        f.write("\n".join(_NDJSON_ROWS) + "\n")
    with open(os.path.join(csv_src, "batch1.csv"), "w") as f:
        f.write("\n".join(_CSV_ROWS) + "\n")
    ingest_batch(spark, src, table)
    write_points(read_csv_points(spark, csv_src), table, mode="append")
    eng = SydraQLEngine(spark, storage_path=table)
    nd = eng.query(
        "select time, value from weather.room1 where time >= 0 and time < 1700000000"
    ).df
    cs = eng.query(
        "select time, value from pressure.p1 where time >= 0 and time < 1700000000"
    ).df
    return nd.select(F.lit("ndjson").alias("fmt"), "time", "value").unionByName(
        cs.select(F.lit("csv").alias("fmt"), "time", "value")
    )


_q(
    "ingest_ndjson_roundtrip",
    _ingest_roundtrip,
    "SELECT * FROM (VALUES "
    "('ndjson', CAST(1694300000 AS BIGINT), CAST(24.2 AS DOUBLE)), "
    "('ndjson', 1694300010, 24.3), ('ndjson', 1694300020, 24.4), "
    "('csv', 1694300000, 101.3), ('csv', 1694300060, 101.4)"
    ") AS t(fmt, time, value)",
)


# --- durable INSERT / DELETE (restart survival) ------------------------------
def _insert_durable(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _scratch(sf_dir, "insert_table", fresh=True)
    src = _scratch(sf_dir, "insert_seed", fresh=True)
    os.makedirs(src)
    with open(os.path.join(src, "seed.ndjson"), "w") as f:
        f.write('{"series": "m.base", "ts": 1000, "value": 1.0}\n')
    ingest_batch(spark, src, table)
    eng = SydraQLEngine(spark, storage_path=table)
    eng.query("insert into m.base (time, value) values (2000, 2.0), (3000, 3.0)")
    # a NEW engine instance = session restart: reads only what is on disk
    eng2 = SydraQLEngine(spark, storage_path=table)
    return eng2.query("select time, value from m.base where time >= 0 and time < 10000").df


_q(
    "insert_durable_roundtrip",
    _insert_durable,
    "SELECT * FROM (VALUES (CAST(1000 AS BIGINT), CAST(1.0 AS DOUBLE)), "
    "(2000, 2.0), (3000, 3.0)) AS t(time, value)",
)


# --- rollup materialization (reference rollup hint, realized) ----------------
def _rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sydradb_spark import rollup as rl

    pts = events_points(spark, sf_dir).where(
        (F.col("series") == "events.purchase")
        & (F.col("tags")["host"] == "h0")
        & (F.col("tags")["dc"] == "dc0")
        & (F.col("ts") >= T0)
        & (F.col("ts") < T1)
    )
    hourly = rl.build_rollup(pts, step_s=3600)
    daily = rl.rollup_answer(rl.combine_rollup(hourly, step_s=86400))
    return daily.select(
        "bucket",
        "n",
        F.round(F.col("sum_v"), 6).alias("sum_v"),
        F.round(F.col("avg_v"), 6).alias("avg_v"),
        "min_v",
        "max_v",
        "first_v",
        "last_v",
    )


_q(
    "rollup_daily_from_hourly",
    _rollup_daily,
    # oracle computes DAILY aggregates directly from raw points — proving the
    # hourly-rollup → daily combination is lossless
    oracle(
        f"SELECT (ts // 86400) * 86400 AS bucket, count(*) AS n, "
        f"{r6('sum(value)')} AS sum_v, {r6('avg(value)')} AS avg_v, "
        f"min(value) AS min_v, max(value) AS max_v, "
        f"arg_min(value, ts) AS first_v, arg_max(value, ts) AS last_v "
        f"FROM points WHERE series = 'events.purchase' AND host = 'h0' AND dc = 'dc0' "
        f"AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)


def _rollup_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine query answered FROM the materialized rollup (translator
    rewrite); the oracle computes from raw points — equality proves the
    rewrite is lossless end-to-end."""
    from sydradb_spark import rollup as rl

    pts = events_points(spark, sf_dir)
    eng = SydraQLEngine(
        spark,
        pts,
        rollup=rl.build_rollup(pts, step_s=3600),
        rollup_step=3600,
    )
    return eng.query(
        f"select time_bucket(86400, time) as bucket, {r6('avg(value)')} as avg_v, "
        f"{r6('sum(value)')} as sum_v, count() as n, min(value) as min_v, "
        f"max(value) as max_v from events.error "
        f"where time >= {T0} and time < {T1} group by time_bucket(86400, time)"
    ).df


_q(
    "rollup_served_engine_query",
    _rollup_engine,
    oracle(
        f"SELECT (ts // 86400) * 86400 AS bucket, {r6('avg(value)')} AS avg_v, "
        f"{r6('sum(value)')} AS sum_v, count(*) AS n, min(value) AS min_v, "
        f"max(value) AS max_v FROM points WHERE series = 'events.error' "
        f"AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)


# --- streaming rollup == batch rollup (§2.11 tied to the rollup path) ---------
def _rollup_stream_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-maintained rollup (NDJSON → watermark → foreachBatch partial
    appends → associative fold) must equal aggregates computed from raw
    points. The oracle aggregates the raw parquet directly, so a green hash
    proves the streaming path is lossless end-to-end."""
    from sydradb_spark.streaming.rollup_stream import read_rollup, stream_rollup

    src = _scratch(sf_dir, "rstream_src", fresh=True)
    roll = _scratch(sf_dir, "rstream_tbl", fresh=True)
    ckpt = _scratch(sf_dir, "rstream_ckpt", fresh=True)
    os.makedirs(src)
    pts = events_points(spark, sf_dir).where(
        (F.col("series") == "events.signup") & (F.col("ts") >= T0) & (F.col("ts") < D3)
    )
    pts.select(
        F.to_json(F.struct("series", "ts", "value", "tags")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(src)
    q = stream_rollup(spark, src, roll, ckpt, step_s=3600, available_now=True)
    q.awaitTermination()
    folded = read_rollup(spark, roll, step_s=3600)
    # fold across the per-series rollup rows to oracle-checkable bucket stats
    # (first/last are per-series; cross-series they need the catalog join)
    return folded.groupBy("bucket").agg(
        F.sum("cnt").alias("n"),
        F.round(F.sum("sum_v"), 6).alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


_q(
    "rollup_stream_batch_equiv",
    _rollup_stream_equiv,
    oracle(
        f"SELECT (ts // 3600) * 3600 AS bucket, count(*) AS n, "
        f"{r6('sum(value)')} AS sum_v, min(value) AS min_v, max(value) AS max_v "
        f"FROM points WHERE series = 'events.signup' AND ts >= {T0} AND ts < {D3} "
        f"GROUP BY 1"
    ),
)


# --- time-aligned multi-series expressions (roadmap JoinTime) -----------------
def _aligned_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sydradb_spark.functions.align import aligned_ratio

    pts = events_points(spark, sf_dir).where(
        (F.col("ts") >= T0) & (F.col("ts") < T1)
    )
    out = aligned_ratio(pts, "events.click", "events.view", step_s=86400)
    return out.select("bucket", F.round(F.col("ratio"), 6).alias("ratio"))


_q(
    "aligned_series_ratio",
    _aligned_ratio,
    oracle(
        f""", a AS (
  SELECT (ts // 86400) * 86400 AS bucket, avg(value) AS av FROM points
  WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1} GROUP BY 1
), b AS (
  SELECT (ts // 86400) * 86400 AS bucket, avg(value) AS bv FROM points
  WHERE series = 'events.view' AND ts >= {T0} AND ts < {T1} GROUP BY 1
)
SELECT a.bucket, {r6('a.av / b.bv')} AS ratio FROM a JOIN b USING (bucket)"""
    ),
)


def _asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sydradb_spark.functions.align import asof_join

    pts = events_points(spark, sf_dir).where(
        (F.col("tags")["host"] == "h1")
        & (F.col("tags")["dc"] == "dc1")
        & (F.col("ts") >= T0)
        & (F.col("ts") < D7)
    )
    left = pts.where(F.col("series") == "events.click")
    right = pts.where(F.col("series") == "events.view")
    # align on ts only (single logical pair): collapse both to one join key
    out = asof_join(
        left.withColumn("series_id", F.lit(0)),
        right.withColumn("series_id", F.lit(0)),
        tolerance_s=86400,
    )
    return out.select(
        "ts", "value", F.round(F.col("right_value"), 6).alias("right_value"), "right_ts"
    )


_q(
    "asof_join_latest_before",
    _asof,
    oracle(
        f""", l AS (
  SELECT ts, value FROM points WHERE series = 'events.click'
    AND host = 'h1' AND dc = 'dc1' AND ts >= {T0} AND ts < {D7}
), r AS (
  SELECT ts, value FROM points WHERE series = 'events.view'
    AND host = 'h1' AND dc = 'dc1' AND ts >= {T0} AND ts < {D7}
), matched AS (
  SELECT l.ts, l.value,
         (SELECT r.value FROM r WHERE r.ts <= l.ts AND l.ts - r.ts <= 86400
          ORDER BY r.ts DESC, r.value DESC LIMIT 1) AS right_value,
         (SELECT r.ts FROM r WHERE r.ts <= l.ts AND l.ts - r.ts <= 86400
          ORDER BY r.ts DESC, r.value DESC LIMIT 1) AS right_ts
  FROM l
)
SELECT ts, value, {r6('right_value')} AS right_value, right_ts FROM matched"""
    ),
)


def _delete_durable(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _scratch(sf_dir, "delete_table", fresh=True)
    pts = events_points(spark, sf_dir).where(F.col("ts") < D7)
    storage.write_points(pts, table, mode="overwrite")
    eng = SydraQLEngine(spark, storage_path=table)
    eng.query(f"delete from events.view where time >= {D3} and tag.host = 'h2'")
    eng2 = SydraQLEngine(spark, storage_path=table)
    return eng2.query(
        f"select count() as n, {r6('sum(value)')} as sum_v from events.view "
        f"where time >= {T0} and time < {D7}"
    ).df


_q(
    "delete_durable",
    _delete_durable,
    oracle(
        f"SELECT count(*) AS n, {r6('sum(value)')} AS sum_v FROM points "
        f"WHERE series = 'events.view' AND ts >= {T0} AND ts < {D7} "
        f"AND NOT coalesce(ts >= {D3} AND host = 'h2', FALSE)"
    ),
)
