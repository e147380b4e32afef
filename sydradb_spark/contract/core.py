"""Driver-contract entries for the sydraQL query surface (SURVEY §2).

Every implemented operator gets a ``QUERIES`` entry (Spark, via the sydraQL
engine over the events→points mapping) and an ``ORACLES`` entry (DuckDB SQL
over the same parquet). Names are grouped by SURVEY §2 section.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sydradb_spark.contract.base import D3, D4, D7, MID, T0, T1, oracle, ql, r6
from sydradb_spark.sydraql.engine import SydraQLEngine
from sydradb_spark.tables import events_points

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, fn, sql: str | None) -> None:
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


# --- §2.1 scans --------------------------------------------------------------
_q(
    "scan_range",
    ql(f"select time, value from events.click where time >= {T0} and time < {T1}"),
    oracle(
        f"SELECT ts AS time, value FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1}"
    ),
)


def _scan_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """by_id(N) selector — series_id resolved from the live table because the
    oracle cannot compute xxhash64; identity semantics, not hash parity."""
    pts = events_points(spark, sf_dir)
    sid = (
        pts.where(
            (F.col("series") == "events.error")
            & (F.col("tags")["host"] == "h1")
            & (F.col("tags")["dc"] == "dc1")
        )
        .select("series_id")
        .first()[0]
    )
    eng = SydraQLEngine(spark, pts)
    return eng.query(
        f"select time, value from by_id({sid}) where time >= {T0} and time < {T1}"
    ).df


_q(
    "scan_by_id",
    _scan_by_id,
    oracle(
        f"SELECT ts AS time, value FROM points WHERE series = 'events.error' "
        f"AND host = 'h1' AND dc = 'dc1' AND ts >= {T0} AND ts < {T1}"
    ),
)

_q(
    "scan_tag_eq",
    ql(
        f"select time, value from events.view "
        f"where time >= {T0} and time < {T1} and tag.host = 'h2'"
    ),
    oracle(
        f"SELECT ts AS time, value FROM points WHERE series = 'events.view' "
        f"AND host = 'h2' AND ts >= {T0} AND ts < {T1}"
    ),
)

_q(
    "scan_tag_qualified_selector",
    # Prometheus-style tag qualifiers in FROM (name+tags selector — the
    # reference's registry implies it, its parser never had syntax for it)
    ql(
        f"select time, value from events.purchase{{host='h3', dc='dc1'}} "
        f"where time >= {T0} and time < {T1}"
    ),
    oracle(
        f"SELECT ts AS time, value FROM points WHERE series = 'events.purchase' "
        f"AND host = 'h3' AND dc = 'dc1' AND ts >= {T0} AND ts < {T1}"
    ),
)

_q(
    "onerow_literals",
    ql("select 1 as one, 2.5 as two, 'hi' as msg"),
    "SELECT 1 AS one, CAST(2.5 AS DOUBLE) AS two, 'hi' AS msg",
)

# --- §2.2 projections / filters ---------------------------------------------
_q(
    "project_arith",
    ql(
        f"select time, {r6('value * 2 + 1')} as v2 from events.click "
        f"where time >= {T0} and time < {D3} and value > 5"
    ),
    oracle(
        f"SELECT ts AS time, {r6('value * 2 + 1')} AS v2 FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0} AND ts < {D3} AND value > 5"
    ),
)

_q(
    "filter_regex",
    ql(
        f"select time, tag.host as host, value from events.view "
        f"where time >= {T0} and time < {D7} and tag.host =~ 'h[02]'"
    ),
    oracle(
        f"SELECT ts AS time, host, value FROM points WHERE series = 'events.view' "
        f"AND ts >= {T0} AND ts < {D7} AND regexp_matches(host, 'h[02]')"
    ),
)

_q(
    "filter_not_regex",
    ql(
        f"select time, tag.dc as dc, value from events.signup "
        f"where time >= {T0} and time < {D7} and tag.dc !~ '0$'"
    ),
    oracle(
        f"SELECT ts AS time, dc, value FROM points WHERE series = 'events.signup' "
        f"AND ts >= {T0} AND ts < {D7} AND NOT regexp_matches(dc, '0$')"
    ),
)

_q(
    "expr_div_mod",
    ql(
        f"select time, {r6('value / 4')} as q, time % 7 as m from events.error "
        f"where time >= {T0} and time < {D3}"
    ),
    oracle(
        f"SELECT ts AS time, {r6('value / 4')} AS q, ts % 7 AS m FROM points "
        f"WHERE series = 'events.error' AND ts >= {T0} AND ts < {D3}"
    ),
)

# --- §2.6 sorts / limits ------------------------------------------------------
_q(
    "limit_offset",
    ql(
        f"select time, value from events.click where time >= {T0} and time < {T1} "
        f"order by time, value limit 50 offset 10"
    ),
    oracle(
        f"SELECT ts AS time, value FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1} "
        f"ORDER BY ts, value LIMIT 50 OFFSET 10"
    ),
)

_q(
    "topk_desc",
    ql(
        f"select time, value from events.purchase where time >= {T0} and time < {T1} "
        f"order by value desc, time limit 20"
    ),
    oracle(
        f"SELECT ts AS time, value FROM points "
        f"WHERE series = 'events.purchase' AND ts >= {T0} AND ts < {T1} "
        f"ORDER BY value DESC, ts LIMIT 20"
    ),
)

_q(
    "implicit_order_limit",
    # no ORDER BY: implicit ascending-time ordering (sydraql-design.md:135)
    # with (ts, value) tiebreak decides which 30 rows survive the LIMIT
    ql(f"select value from events.error where time >= {T0} and time < {T1} limit 30"),
    oracle(
        f"SELECT value FROM points WHERE series = 'events.error' "
        f"AND ts >= {T0} AND ts < {T1} ORDER BY ts, value LIMIT 30"
    ),
)

# --- §2.4 aggregations --------------------------------------------------------
_q(
    "agg_global",
    ql(
        f"select count() as n, count(value) as nv, {r6('avg(value)')} as avg_v, "
        f"min(value) as min_v, max(value) as max_v from events.signup "
        f"where time >= {T0} and time < {T1}"
    ),
    oracle(
        f"SELECT count(*) AS n, count(value) AS nv, {r6('avg(value)')} AS avg_v, "
        f"min(value) AS min_v, max(value) AS max_v FROM points "
        f"WHERE series = 'events.signup' AND ts >= {T0} AND ts < {T1}"
    ),
)

_q(
    "agg_bucket_basic",
    ql(
        f"select time_bucket(86400, time) as bucket, {r6('avg(value)')} as avg_v, "
        f"{r6('sum(value)')} as sum_v, count() as n, count(value) as nv, "
        f"min(value) as min_v, max(value) as max_v from events.view "
        f"where time >= {T0} and time < {T1} group by time_bucket(86400, time)"
    ),
    oracle(
        f"SELECT (ts // 86400) * 86400 AS bucket, {r6('avg(value)')} AS avg_v, "
        f"{r6('sum(value)')} AS sum_v, count(*) AS n, count(value) AS nv, "
        f"min(value) AS min_v, max(value) AS max_v FROM points "
        f"WHERE series = 'events.view' AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)

_q(
    "agg_first_last",
    # grouped per exact series (host+dc) so min_by/max_by ties cannot occur
    ql(
        f"select tag.host as host, tag.dc as dc, time_bucket(86400, time) as bucket, "
        f"first(value) as first_v, last(value) as last_v from events.purchase "
        f"where time >= {T0} and time < {T1} "
        f"group by tag.host, tag.dc, time_bucket(86400, time)"
    ),
    oracle(
        f"SELECT host, dc, (ts // 86400) * 86400 AS bucket, "
        f"arg_min(value, ts) AS first_v, arg_max(value, ts) AS last_v FROM points "
        f"WHERE series = 'events.purchase' AND ts >= {T0} AND ts < {T1} GROUP BY 1, 2, 3"
    ),
)

_q(
    "agg_percentile",
    ql(
        f"select time_bucket(86400, time) as bucket, {r6('percentile(value, 0.5)')} as p50, "
        f"count() as n from events.signup "
        f"where time >= {T0} and time < {T1} and tag.host = 'h0' and tag.dc = 'dc0' "
        f"group by time_bucket(86400, time)"
    ),
    oracle(
        f"SELECT (ts // 86400) * 86400 AS bucket, "
        f"{r6('quantile_cont(value, 0.5)')} AS p50, count(*) AS n FROM points "
        f"WHERE series = 'events.signup' AND host = 'h0' AND dc = 'dc0' "
        f"AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)

_q(
    "agg_rate_delta",
    ql(
        f"select tag.host as host, tag.dc as dc, time_bucket(86400, time) as bucket, "
        f"{r6('rate(value)')} as rate_v, {r6('delta(value)')} as delta_v "
        f"from events.click where time >= {T0} and time < {T1} "
        f"group by tag.host, tag.dc, time_bucket(86400, time)"
    ),
    oracle(
        f"SELECT host, dc, (ts // 86400) * 86400 AS bucket, "
        f"CASE WHEN max(ts) > min(ts) THEN "
        f"{r6('(arg_max(value, ts) - arg_min(value, ts)) / (max(ts) - min(ts))')} END AS rate_v, "
        f"{r6('arg_max(value, ts) - arg_min(value, ts)')} AS delta_v FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1} GROUP BY 1, 2, 3"
    ),
)

_q(
    "agg_irate",
    # one exact series: the per-series lag pre-pass must see the same row
    # sequence as the oracle's window
    ql(
        f"select time_bucket(86400, time) as bucket, {r6('irate(value)')} as irate_v "
        f"from events.signup where time >= {T0} and time < {T1} "
        f"and tag.host = 'h0' and tag.dc = 'dc0' group by time_bucket(86400, time)"
    ),
    f"""WITH f AS (
  SELECT epoch_ns(ts) // 1000000000 AS ts, value FROM events
  WHERE 'events.' || event_type = 'events.signup'
    AND 'h' || CAST(user_id % 5 AS VARCHAR) = 'h0'
    AND 'dc' || CAST(user_id % 2 AS VARCHAR) = 'dc0'
    AND epoch_ns(ts) // 1000000000 >= {T0} AND epoch_ns(ts) // 1000000000 < {T1}
), l AS (
  SELECT ts, value,
         lag(value) OVER (ORDER BY ts, value) AS pv,
         lag(ts) OVER (ORDER BY ts, value) AS pts
  FROM f
)
SELECT (ts // 86400) * 86400 AS bucket,
       {r6("arg_max(CASE WHEN ts - pts > 0 THEN (value - pv) / (ts - pts) END, "
           "CASE WHEN ts - pts > 0 AND pv IS NOT NULL THEN ts END)")} AS irate_v
FROM l GROUP BY 1""",
)

_q(
    "agg_integral",
    ql(
        f"select time_bucket(86400, time) as bucket, {r6('integral(value)')} as area "
        f"from events.error where time >= {T0} and time < {T1} "
        f"and tag.host = 'h1' and tag.dc = 'dc1' group by time_bucket(86400, time)"
    ),
    f"""WITH f AS (
  SELECT epoch_ns(ts) // 1000000000 AS ts, value FROM events
  WHERE 'events.' || event_type = 'events.error'
    AND 'h' || CAST(user_id % 5 AS VARCHAR) = 'h1'
    AND 'dc' || CAST(user_id % 2 AS VARCHAR) = 'dc1'
    AND epoch_ns(ts) // 1000000000 >= {T0} AND epoch_ns(ts) // 1000000000 < {T1}
), l AS (
  SELECT ts, value,
         lag(value) OVER (ORDER BY ts, value) AS pv,
         lag(ts) OVER (ORDER BY ts, value) AS pts
  FROM f
)
SELECT (ts // 86400) * 86400 AS bucket,
       {r6('sum((value + pv) / 2 * (ts - pts))')} AS area
FROM l GROUP BY 1""",
)

_q(
    "agg_group_tag",
    ql(
        f"select tag.host as host, {r6('avg(value)')} as avg_v, count() as n "
        f"from events.error where time >= {T0} and time < {T1} group by tag.host"
    ),
    oracle(
        f"SELECT host, {r6('avg(value)')} AS avg_v, count(*) AS n FROM points "
        f"WHERE series = 'events.error' AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)

_q(
    "agg_alias_group",
    # GROUP BY references the select alias (optimizer.zig:570-607)
    ql(
        f"select time_bucket(7200, time) as b, count() as n from events.click "
        f"where time >= {T0} and time < {T1} group by b"
    ),
    oracle(
        f"SELECT (ts // 7200) * 7200 AS b, count(*) AS n FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)

_q(
    "agg_multi_key",
    ql(
        f"select tag.host as host, tag.dc as dc, count() as n, "
        f"{r6('sum(value)')} as sum_v from events.view "
        f"where time >= {T0} and time < {T1} group by tag.host, tag.dc"
    ),
    oracle(
        f"SELECT host, dc, count(*) AS n, {r6('sum(value)')} AS sum_v FROM points "
        f"WHERE series = 'events.view' AND ts >= {T0} AND ts < {T1} GROUP BY 1, 2"
    ),
)

_q(
    "agg_expr_on_agg",
    ql(
        f"select time_bucket(86400, time) as bucket, "
        f"{r6('max(value) - min(value)')} as spread, {r6('avg(value) / 2')} as half_avg "
        f"from events.purchase where time >= {T0} and time < {T1} "
        f"group by time_bucket(86400, time)"
    ),
    oracle(
        f"SELECT (ts // 86400) * 86400 AS bucket, "
        f"{r6('max(value) - min(value)')} AS spread, {r6('avg(value) / 2')} AS half_avg "
        f"FROM points WHERE series = 'events.purchase' AND ts >= {T0} AND ts < {T1} "
        f"GROUP BY 1"
    ),
)

# --- §2.8 scalar functions ----------------------------------------------------
_q(
    "scalar_functions",
    ql(
        f"select time, round(value) as roundv, ceil(value) as ceilv, "
        f"floor(value) as floorv, abs(0 - value) as absv, "
        f"{r6('pow(value, 2)')} as powv, {r6('ln(value)')} as lnv, "
        f"{r6('sqrt(value)')} as sqrtv, coalesce(value, 0) as cv "
        f"from events.purchase where time >= {T0} and time < {D3}"
    ),
    oracle(
        f"SELECT ts AS time, round(value) AS roundv, ceil(value) AS ceilv, "
        f"floor(value) AS floorv, abs(0 - value) AS absv, "
        f"{r6('pow(value, 2)')} AS powv, {r6('ln(value)')} AS lnv, "
        f"{r6('sqrt(value)')} AS sqrtv, coalesce(value, 0) AS cv FROM points "
        f"WHERE series = 'events.purchase' AND ts >= {T0} AND ts < {D3}"
    ),
)

_q(
    "time_bucket_origin",
    # 3-arg origin variant (registry functions.zig:314-324, never implemented
    # in the reference runtime)
    ql(
        f"select time_bucket(3600, time, 900) as b, count() as n from events.view "
        f"where time >= {T0} and time < {T1} group by time_bucket(3600, time, 900)"
    ),
    oracle(
        f"SELECT ((ts - 900) // 3600) * 3600 + 900 AS b, count(*) AS n FROM points "
        f"WHERE series = 'events.view' AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)

_q(
    "duration_timestamp_literals",
    # duration (`1h`) + ISO8601 timestamp literals: specced in the reference
    # design doc (sydraql-design.md:92) but never lexed there — implemented
    # here (lexer.py:104-187). 2024-01-05T00:00:00Z = 1704412800.
    ql(
        "select time_bucket(1h, time) as b, count() as n from events.click "
        "where time >= 2024-01-05T00:00:00Z and time < 2024-01-08T00:00:00Z "
        "group by time_bucket(1h, time)"
    ),
    oracle(
        "SELECT (ts // 3600) * 3600 AS b, count(*) AS n FROM points "
        "WHERE series = 'events.click' AND ts >= 1704412800 AND ts < 1704672000 "
        "GROUP BY 1"
    ),
)

# --- §2.5 window functions ----------------------------------------------------
_q(
    "window_lag",
    ql(
        f"select time, tag.host as host, tag.dc as dc, value, lag(value) as prev "
        f"from events.click where time >= {T0} and time < {D4}"
    ),
    oracle(
        f"SELECT ts AS time, host, dc, value, "
        f"lag(value) OVER (PARTITION BY series, host, dc ORDER BY ts, value) AS prev "
        f"FROM points WHERE series = 'events.click' AND ts >= {T0} AND ts < {D4}"
    ),
)

_q(
    "window_lead",
    ql(
        f"select time, tag.host as host, tag.dc as dc, value, lead(value, 2) as nxt "
        f"from events.error where time >= {T0} and time < {D4}"
    ),
    oracle(
        f"SELECT ts AS time, host, dc, value, "
        f"lead(value, 2) OVER (PARTITION BY series, host, dc ORDER BY ts, value) AS nxt "
        f"FROM points WHERE series = 'events.error' AND ts >= {T0} AND ts < {D4}"
    ),
)

_q(
    "window_moving_avg",
    ql(
        f"select time, {r6('moving_avg(value, 3600)')} as ma from events.view "
        f"where time >= {T0} and time < {T1} and tag.host = 'h2' and tag.dc = 'dc0'"
    ),
    oracle(
        f"SELECT ts AS time, {r6('avg(value) OVER (ORDER BY ts RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)')} AS ma "
        f"FROM points WHERE series = 'events.view' AND host = 'h2' AND dc = 'dc0' "
        f"AND ts >= {T0} AND ts < {T1}"
    ),
)

_q(
    "window_fill_forward",
    # value is never null in this table, so fill_forward(value) == value; the
    # null-patching path is pinned by tests/test_engine_e2e.py instead
    ql(
        f"select time, fill_forward(value) as ff from events.signup "
        f"where time >= {T0} and time < {D7} and tag.host = 'h1' and tag.dc = 'dc1'"
    ),
    oracle(
        f"SELECT ts AS time, value AS ff FROM points WHERE series = 'events.signup' "
        f"AND host = 'h1' AND dc = 'dc1' AND ts >= {T0} AND ts < {D7}"
    ),
)

# ema oracle: the engine computes s_1 = x_1, s_i = α·x_i + (1-α)·s_{i-1} over
# (ts, value) order (pandas ewm(adjust=False); timeseries.with_ema). A DuckDB
# recursive CTE replays the exact recursion — numerically stable where the
# pow() closed form overflows — with r6 applied at projection on both sides.
from sydradb_spark.contract.base import POINTS_CTE as _PCTE

_q(
    "window_ema",
    ql(
        f"select time, {r6('ema(value, 60, 0.5)')} as ema_v from events.click "
        f"where time >= {T0} and time < {D7} and tag.host = 'h0' and tag.dc = 'dc0'"
    ),
    _PCTE.replace("WITH points AS", "WITH RECURSIVE points AS", 1)
    + f""",
f AS (
  SELECT ts, value, CAST(row_number() OVER (ORDER BY ts, value) AS BIGINT) AS rn
  FROM points WHERE series = 'events.click' AND host = 'h0' AND dc = 'dc0'
    AND ts >= {T0} AND ts < {D7}
), e AS (
  SELECT rn, ts, CAST(value AS DOUBLE) AS s FROM f WHERE rn = 1
  UNION ALL
  SELECT f.rn, f.ts, 0.5 * f.value + 0.5 * e.s FROM f JOIN e ON f.rn = e.rn + 1
)
SELECT ts AS time, {r6('s')} AS ema_v FROM e""",
)

# --- §2.9 FILL ---------------------------------------------------------------
# The engine fills the RAW aggregate column and applies the select-item
# expression (the r6 rounding) afterwards, so the oracle must lerp/carry raw
# averages and round only in the outermost projection.
_FILL_AGG = (
    f"SELECT (ts // 14400) * 14400 AS bucket, avg(value) AS avg_v "
    f"FROM points WHERE series = 'events.error' AND value > 300 "
    f"AND ts >= {T0} AND ts < {T1} GROUP BY 1"
)


def _fill_oracle(patch: str) -> str:
    return oracle(
        f""", agg AS (
  {_FILL_AGG}
), spine AS (
  SELECT unnest(generate_series((SELECT min(bucket) FROM agg),
                                (SELECT max(bucket) FROM agg), 14400)) AS bucket
), filled AS (
  SELECT s.bucket, {patch} FROM spine s LEFT JOIN agg a USING (bucket)
)
SELECT bucket, {r6('avg_v')} AS avg_v FROM filled"""
    )


_FILL_QL = (
    f"select time_bucket(14400, time) as bucket, {r6('avg(value)')} as avg_v "
    f"from events.error where time >= {T0} and time < {T1} and value > 300 "
    f"group by time_bucket(14400, time)"
)

_q("fill_null", ql(_FILL_QL + " fill(null)"), _fill_oracle("a.avg_v AS avg_v"))
_q(
    "fill_constant",
    ql(_FILL_QL + " fill(0.0)"),
    _fill_oracle("coalesce(a.avg_v, 0.0) AS avg_v"),
)
_q(
    "fill_previous",
    ql(_FILL_QL + " fill(previous)"),
    _fill_oracle(
        "last_value(a.avg_v IGNORE NULLS) OVER "
        "(ORDER BY s.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v"
    ),
)
_q(
    "fill_linear",
    ql(_FILL_QL + " fill(linear)"),
    oracle(
        f""", agg AS (
  {_FILL_AGG}
), spine AS (
  SELECT unnest(generate_series((SELECT min(bucket) FROM agg),
                                (SELECT max(bucket) FROM agg), 14400)) AS bucket
), filled AS (
  SELECT s.bucket,
    CASE WHEN a.avg_v IS NOT NULL THEN a.avg_v ELSE
      last_value(a.avg_v IGNORE NULLS) OVER prev
      + (first_value(a.avg_v IGNORE NULLS) OVER nxt
         - last_value(a.avg_v IGNORE NULLS) OVER prev)
        * (s.bucket - last_value(CASE WHEN a.avg_v IS NOT NULL THEN s.bucket END IGNORE NULLS) OVER prev)
        / (first_value(CASE WHEN a.avg_v IS NOT NULL THEN s.bucket END IGNORE NULLS) OVER nxt
           - last_value(CASE WHEN a.avg_v IS NOT NULL THEN s.bucket END IGNORE NULLS) OVER prev)
    END AS avg_v
  FROM spine s LEFT JOIN agg a USING (bucket)
  WINDOW prev AS (ORDER BY s.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         nxt AS (ORDER BY s.bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT bucket, {r6('avg_v')} AS avg_v FROM filled"""
    ),
)

_q(
    "fill_grouped_previous",
    ql(
        f"select tag.dc as dc, time_bucket(43200, time) as bucket, "
        f"{r6('avg(value)')} as avg_v from events.purchase "
        f"where time >= {T0} and time < {T1} and value > 300 "
        f"group by tag.dc, time_bucket(43200, time) fill(previous)"
    ),
    oracle(
        f""", agg AS (
  SELECT dc, (ts // 43200) * 43200 AS bucket, avg(value) AS avg_v
  FROM points WHERE series = 'events.purchase' AND value > 300
    AND ts >= {T0} AND ts < {T1} GROUP BY 1, 2
), spine AS (
  SELECT dc, unnest(generate_series(mn, mx, 43200)) AS bucket
  FROM (SELECT dc, min(bucket) AS mn, max(bucket) AS mx FROM agg GROUP BY 1)
), filled AS (
  SELECT s.dc, s.bucket,
         last_value(a.avg_v IGNORE NULLS) OVER
           (PARTITION BY s.dc ORDER BY s.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v
  FROM spine s LEFT JOIN agg a ON s.dc = a.dc AND s.bucket = a.bucket
)
SELECT dc, bucket, {r6('avg_v')} AS avg_v FROM filled"""
    ),
)

# --- §2.10 statements ---------------------------------------------------------
_q(
    "insert_select_roundtrip",
    ql(
        "insert into manual.metric (time, value) values (1704067200, 1.5)",
        "insert into manual.metric (time, value) values (1704067260, 2.5), (1704067320, 4.0)",
        "select time, value from manual.metric where time >= 0 and time < 1704068000",
    ),
    "SELECT * FROM (VALUES (CAST(1704067200 AS BIGINT), CAST(1.5 AS DOUBLE)), "
    "(1704067260, 2.5), (1704067320, 4.0)) AS t(time, value)",
)

def _compat_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pgwire-compat path end-to-end: SQL string → compat translator →
    sydraQL engine (reference entry point B, wire protocol excluded)."""
    from sydradb_spark.compat.translator import translate

    t = translate(
        f"SELECT time, value FROM events.view WHERE time >= {T0} AND time < {D3}"
    )
    assert t.ok, t.message
    eng = SydraQLEngine(spark, events_points(spark, sf_dir))
    return eng.query(t.sydraql).df


_q(
    "compat_sql_select",
    _compat_sql,
    oracle(
        f"SELECT ts AS time, value FROM points WHERE series = 'events.view' "
        f"AND ts >= {T0} AND ts < {D3}"
    ),
)

_q(
    "delete_then_count",
    ql(
        f"delete from events.click where time >= {MID} and tag.host = 'h3'",
        f"select count() as n, {r6('sum(value)')} as sum_v from events.click "
        f"where time >= {T0} and time < {T1}",
    ),
    oracle(
        f"SELECT count(*) AS n, {r6('sum(value)')} AS sum_v FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1} "
        f"AND NOT coalesce(ts >= {MID} AND host = 'h3', FALSE)"
    ),
)
