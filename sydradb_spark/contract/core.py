"""Driver-contract entries for the sydraQL query surface (SURVEY §2).

Every implemented operator gets a ``QUERIES`` entry (Spark, via the sydraQL
engine over the events→points mapping) and an ``ORACLES`` entry (DuckDB SQL
over the same parquet). Names are grouped by SURVEY §2 section.

Round-3 consolidation: the driver checks at most ~50 catalog entries, so
near-duplicate variants are folded into multi-variant entries (union with a
``variant`` label column, or extra columns on one query) — every §2 feature
keeps oracle coverage while the catalog fits the driver's check budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sydradb_spark.contract.base import (
    D3,
    D4,
    D7,
    MID,
    POINTS_CTE,
    T0,
    T1,
    events_slice,
    oracle,
    ql,
    r3,
    r3_col,
    r6,
    r6_col,
)
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


def _scan_selector_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three physical selector paths in one entry: ``by_id(N)``
    (series_id resolved from the live table — the oracle cannot compute
    xxhash64, so this checks identity semantics, not hash parity), a
    WHERE-clause tag filter, and a Prometheus-style qualified FROM selector
    ``name{k='v'}`` (registry-implied, never parsed in the reference).
    Round-8 consolidation: the former `limit_offset_variants` entry (§2.6
    items 34/36 — explicit ORDER BY + LIMIT/OFFSET, and the implicit
    ascending-time order deciding a LIMIT with `time` unprojected) rides
    the same (path, time, value) shape as two more labeled paths, freeing
    a catalog slot for `bm25_retrieval`."""
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
    a = eng.query(
        f"select time, value from by_id({sid}) where time >= {T0} and time < {T1}"
    ).df
    b = eng.query(
        f"select time, value from events.view "
        f"where time >= {T0} and time < {T1} and tag.host = 'h2'"
    ).df
    c = eng.query(
        f"select time, value from events.purchase{{host='h3', dc='dc1'}} "
        f"where time >= {T0} and time < {T1}"
    ).df
    # fourth path (former filter_regex entry, merged round 6 to free a
    # catalog slot for sessionize_gap): both regex operators in one
    # conjunction
    d = eng.query(
        f"select time, value from events.view "
        f"where time >= {T0} and time < {D7} and tag.host =~ 'h[02]' "
        f"and tag.dc !~ '0$'"
    ).df
    e = eng.query(
        f"select time, value from events.click where time >= {T0} and time < {T1} "
        f"order by time, value limit 50 offset 10"
    ).df
    # implicit ascending-time order deciding a LIMIT with `time` unprojected
    # (sydraql-design.md:135) — hidden sort keys must survive the projection
    f = eng.query(
        f"select value from events.error where time >= {T0} and time < {T1} limit 30"
    ).df
    return (
        a.select(F.lit("by_id").alias("path"), "time", "value")
        .unionByName(b.select(F.lit("tag_where").alias("path"), "time", "value"))
        .unionByName(c.select(F.lit("tag_selector").alias("path"), "time", "value"))
        .unionByName(d.select(F.lit("regex").alias("path"), "time", "value"))
        .unionByName(
            e.select(F.lit("limit_explicit").alias("path"), "time", "value")
        )
        .unionByName(
            f.select(
                F.lit("limit_implicit").alias("path"),
                F.lit(None).cast("long").alias("time"),
                "value",
            )
        )
    )


_q(
    "scan_limit_paths",
    _scan_selector_paths,
    oracle(
        f"""SELECT 'by_id' AS path, ts AS time, value FROM points
  WHERE series = 'events.error' AND host = 'h1' AND dc = 'dc1'
    AND ts >= {T0} AND ts < {T1}
UNION ALL
SELECT 'tag_where', ts, value FROM points
  WHERE series = 'events.view' AND host = 'h2' AND ts >= {T0} AND ts < {T1}
UNION ALL
SELECT 'tag_selector', ts, value FROM points
  WHERE series = 'events.purchase' AND host = 'h3' AND dc = 'dc1'
    AND ts >= {T0} AND ts < {T1}
UNION ALL
SELECT 'regex', ts, value FROM points
  WHERE series = 'events.view' AND ts >= {T0} AND ts < {D7}
    AND regexp_matches(host, 'h[02]') AND NOT regexp_matches(dc, '0$')
UNION ALL
SELECT 'limit_explicit', time, value FROM (
  SELECT ts AS time, value FROM points WHERE series = 'events.click'
    AND ts >= {T0} AND ts < {T1} ORDER BY ts, value LIMIT 50 OFFSET 10)
UNION ALL
SELECT 'limit_implicit', CAST(NULL AS BIGINT), value FROM (
  SELECT value FROM points WHERE series = 'events.error'
    AND ts >= {T0} AND ts < {T1} ORDER BY ts, value LIMIT 30)"""
    ),
)

# --- §2.2 projections / filters + §2.8 scalar functions -----------------------
# Round-6 consolidation (driver caps checked entries at 50): the former
# `project_arith` (§2 items 15/16: arithmetic projection, ANSI-safe
# division/modulo) and `scalar_functions` (§2 item 38: abs/ceil/floor/round/
# pow/ln/sqrt/coalesce) entries are one labeled union — disjoint series and
# null-padded columns keep both sub-checks exact.
_SCALAR_PAD = ("roundv", "ceilv", "floorv", "absv", "powv", "lnv", "sqrtv", "cv")


def _project_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = SydraQLEngine(spark, events_points(spark, sf_dir))
    a = eng.query(
        f"select time, {r6('value * 2 + 1')} as v2, {r6('value / 4')} as q, "
        f"time % 7 as m from events.click "
        f"where time >= {T0} and time < {D3} and value > 5"
    ).df
    b = eng.query(
        f"select time, round(value) as roundv, ceil(value) as ceilv, "
        f"floor(value) as floorv, abs(0 - value) as absv, "
        f"{r6('pow(value, 2)')} as powv, {r6('ln(value)')} as lnv, "
        f"{r6('sqrt(value)')} as sqrtv, coalesce(value, 0) as cv "
        f"from events.purchase where time >= {T0} and time < {D3}"
    ).df
    dnull = F.lit(None).cast("double")
    return a.select(
        F.lit("arith").alias("variant"),
        "time",
        "v2",
        "q",
        "m",
        *[dnull.alias(c) for c in _SCALAR_PAD],
    ).unionByName(
        b.select(
            F.lit("scalar").alias("variant"),
            "time",
            dnull.alias("v2"),
            dnull.alias("q"),
            F.lit(None).cast("long").alias("m"),
            *_SCALAR_PAD,
        )
    )


_q(
    "project_scalar_functions",
    _project_scalar,
    oracle(
        f"""SELECT 'arith' AS variant, ts AS time, {r6('value * 2 + 1')} AS v2,
       {r6('value / 4')} AS q, ts % 7 AS m,
       CAST(NULL AS DOUBLE) AS roundv, CAST(NULL AS DOUBLE) AS ceilv,
       CAST(NULL AS DOUBLE) AS floorv, CAST(NULL AS DOUBLE) AS absv,
       CAST(NULL AS DOUBLE) AS powv, CAST(NULL AS DOUBLE) AS lnv,
       CAST(NULL AS DOUBLE) AS sqrtv, CAST(NULL AS DOUBLE) AS cv
  FROM points WHERE series = 'events.click' AND ts >= {T0} AND ts < {D3} AND value > 5
UNION ALL
SELECT 'scalar', ts, NULL, NULL, NULL,
       round(value), ceil(value), floor(value), abs(0 - value),
       {r6('pow(value, 2)')}, {r6('ln(value)')}, {r6('sqrt(value)')},
       coalesce(value, 0)
  FROM points WHERE series = 'events.purchase' AND ts >= {T0} AND ts < {D3}"""
    ),
)

def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series session windows (gap 600 s) via native F.session_window —
    beyond-reference sessionization; same code path Structured Streaming
    uses (streaming equivalence pinned in tests/test_streaming.py).

    Round-13 rotation (VERDICT r12 item 4) adds the two monitoring
    complements that were pytest-only, as labeled variants over the SAME
    time slice: ``gap`` = detect_gaps (the >600s silences BETWEEN the
    sessions above — one lag pass, the inverse predicate) and ``stale`` =
    stale_series (per-series last_ts/age at now=D3, 900s timeout — which
    series are stale is data-dependent, and the oracle computes the same
    max-aggregate from the same rows)."""
    from sydradb_spark.functions.timeseries import detect_gaps, stale_series
    from sydradb_spark.streaming.windowed import sessionize

    from sydradb_spark.contract.base import events_time_slice

    pts = events_time_slice(events_points(spark, sf_dir), T0, D3)
    lnull = F.lit(None).cast("long")
    dnull = F.lit(None).cast("double")
    sess = sessionize(pts, gap_s=600).select(
        F.lit("sess").alias("variant"),
        "series",
        "session_start",
        "session_end",
        "n_events",
        r3_col(F.col("sum_v")).alias("sum_v"),
    )
    gaps = detect_gaps(pts, max_gap_s=600, partition_col="series").select(
        F.lit("gap").alias("variant"),
        "series",
        F.col("gap_start").alias("session_start"),
        F.col("gap_end").alias("session_end"),
        F.col("gap_s").alias("n_events"),
        dnull.alias("sum_v"),
    )
    stale = stale_series(pts, now_ts=D3, timeout_s=900, partition_col="series").select(
        F.lit("stale").alias("variant"),
        "series",
        F.col("last_ts").alias("session_start"),
        lnull.alias("session_end"),
        F.col("age_s").alias("n_events"),
        dnull.alias("sum_v"),
    )
    return sess.unionByName(gaps).unionByName(stale)


_q(
    "sessionize_gap",
    _sessionize,
    oracle(
        f""", s AS (
  SELECT series, ts, value, seq,
         lag(ts) OVER (PARTITION BY series ORDER BY ts, seq) AS pts,
         CASE WHEN lag(ts) OVER (PARTITION BY series ORDER BY ts, seq) IS NULL
              OR ts - lag(ts) OVER (PARTITION BY series ORDER BY ts, seq) > 600
              THEN 1 ELSE 0 END AS brk
  FROM points WHERE ts >= {T0} AND ts < {D3}
), i AS (
  SELECT series, ts, value,
         sum(brk) OVER (PARTITION BY series ORDER BY ts, seq
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT 'sess' AS variant, series, min(ts) AS session_start,
       max(ts) + 600 AS session_end, count(*) AS n_events,
       {r3('sum(value)')} AS sum_v
FROM i GROUP BY series, sid
UNION ALL
SELECT 'gap', series, pts, ts, ts - pts, CAST(NULL AS DOUBLE)
FROM s WHERE pts IS NOT NULL AND ts - pts > 600
UNION ALL
SELECT 'stale', series, max(ts), CAST(NULL AS BIGINT), {D3} - max(ts),
       CAST(NULL AS DOUBLE)
FROM s GROUP BY series HAVING {D3} - max(ts) > 900"""
    ),
)


# --- §2.6 sorts / limits ------------------------------------------------------
# (the former `limit_offset_variants` entry is folded into `scan_limit_paths`
# above — round-8 consolidation to free a slot for `bm25_retrieval`; top-k
# fusion keeps its own headline entry below)
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

# --- §2.4 aggregations --------------------------------------------------------
# (the global-aggregate entry is folded into `onerow_agg_semantics` below —
# round-6 consolidation to fit the driver's 50-entry cap)
_q(
    "agg_bucket_basic",
    ql(
        f"select time_bucket(86400, time) as bucket, {r6('avg(value)')} as avg_v, "
        f"{r3('sum(value)')} as sum_v, count() as n, count(value) as nv, "
        f"min(value) as min_v, max(value) as max_v from events.view "
        f"where time >= {T0} and time < {T1} group by time_bucket(86400, time)"
    ),
    oracle(
        f"SELECT (ts // 86400) * 86400 AS bucket, {r6('avg(value)')} AS avg_v, "
        f"{r3('sum(value)')} AS sum_v, count(*) AS n, count(value) AS nv, "
        f"min(value) AS min_v, max(value) AS max_v FROM points "
        f"WHERE series = 'events.view' AND ts >= {T0} AND ts < {T1} GROUP BY 1"
    ),
)

# LTTB oracle geometry (r12 rotation): n/n_out chosen so numpy's
# linspace(1, n-1, n_out-1) edges are EXACT integers (step = (n-2)/(n_out-2)
# divides evenly) — the recursive-CTE replay then shares bucket boundaries
# with the Spark kernel bit-for-bit. Centroid means are exact-equal BY
# CONSTRUCTION since r13 (ADVICE r12): the kernel folds each centroid sum
# strictly left-to-right (np.cumsum prefix — ndarray.mean's 8-way-unrolled
# pairwise sum would only coincide empirically) and the oracle uses
# list_reduce, DuckDB's left fold, over the identically-ordered slice — the
# same IEEE additions in the same order on both sides.
_LTTB_N = 1002
_LTTB_NOUT = 12
_LTTB_W = (_LTTB_N - 2) // (_LTTB_NOUT - 2)  # 100, exact
_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 500.0, 20
_ANOM_THRESHOLD = 2.5


# Round-8 consolidation (frees a slot for `semantic_dedup`): the former
# `agg_first_last` (§2.4 items 23/24: first/last min_by/max_by on ts +
# exact percentile, grouped per exact series so ties cannot occur) and
# `agg_multi_key` (§2.4 item 27: multi-key tag grouping) entries are one
# labeled union with null-padded columns — both sub-checks stay exact.
# Round-12 rotation (VERDICT r11 item 5) adds the three beyond-reference
# time-series profiling ops that were pytest-pinned only: value_histogram
# ('hist'), anomalies_zscore ('anom'), and LTTB downsampling ('lttb' — the
# sequential bucket-pick replayed in DuckDB as a recursive CTE).
def _agg_grouped_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sydradb_spark.functions.timeseries import (
        anomalies_zscore,
        lttb,
        value_histogram,
    )

    eng = SydraQLEngine(spark, events_points(spark, sf_dir))
    a = eng.query(
        f"select tag.host as host, tag.dc as dc, time_bucket(86400, time) as bucket, "
        f"first(value) as first_v, last(value) as last_v, "
        f"{r6('percentile(value, 0.5)')} as p50, count() as n from events.purchase "
        f"where time >= {T0} and time < {T1} "
        f"group by tag.host, tag.dc, time_bucket(86400, time)"
    ).df
    b = eng.query(
        f"select tag.host as host, tag.dc as dc, count() as n, "
        f"{r3('sum(value)')} as sum_v, {r6('avg(value)')} as avg_v from events.view "
        f"where time >= {T0} and time < {T1} group by tag.host, tag.dc"
    ).df
    pts = events_points(spark, sf_dir)
    # events_slice adds the redundant raw-column predicates so the filters
    # below reach the parquet scan as PushedFilters (r12 explain audit)
    # 'hist': fixed-range histogram of purchase values (clamping edge bins)
    hist = value_histogram(
        events_slice(pts, "purchase", T0, T1),
        lo=_HIST_LO,
        hi=_HIST_HI,
        n_bins=_HIST_BINS,
    )
    # 'anom': per-host z-score outliers on the error series
    anom = anomalies_zscore(
        events_slice(pts, "error", T0, T1).select(
            F.col("tags")["host"].alias("host"), "ts", "value"
        ),
        threshold=_ANOM_THRESHOLD,
        partition_col="host",
    )
    # 'lttb': downsample a deterministic 1002-point click range to 12 picks;
    # ts is shifted to a small origin for float-stable triangle areas (the
    # picks' OUTPUT rows still carry the real ts)
    from pyspark.sql.window import Window

    sub = (
        events_slice(pts, "click", T0, T1)
        .select(
            F.lit("events.click").alias("series"),
            "ts",
            (F.col("ts") - F.lit(T0)).cast("double").alias("tsn"),
            "value",
        )
        .orderBy("ts", "value")
        .limit(_LTTB_N)
        # row count as a COLUMN (single-series window over the <=1002-row
        # limit result), not an eager driver-side count() action — the
        # geometry guard below stays inside the one lazy plan instead of
        # costing an extra Spark job per entry run (VERDICT r12 item 5)
        .withColumn("__n", F.count("*").over(Window.partitionBy("series")))
    )
    # the oracle's recursive replay is pinned to the exact 1002-point
    # geometry (integer bucket edges); at scale factors too small to fill
    # the window both sides emit an empty 'lttb' part instead
    picks = (
        lttb(sub, _LTTB_NOUT, partition_col="series", ts_col="tsn")
        .where(F.col("__n") == _LTTB_N)
        .drop("__n")
    )

    dnull = F.lit(None).cast("double")
    lnull = F.lit(None).cast("long")
    snull = F.lit(None).cast("string")
    return (
        a.select(
            F.lit("first_last").alias("variant"),
            "host",
            "dc",
            "bucket",
            "first_v",
            "last_v",
            "p50",
            "n",
            dnull.alias("sum_v"),
            dnull.alias("avg_v"),
        )
        .unionByName(
            b.select(
                F.lit("multi_key").alias("variant"),
                "host",
                "dc",
                F.lit(None).cast("long").alias("bucket"),
                dnull.alias("first_v"),
                dnull.alias("last_v"),
                dnull.alias("p50"),
                "n",
                "sum_v",
                "avg_v",
            )
        )
        .unionByName(
            hist.select(
                F.lit("hist").alias("variant"),
                snull.alias("host"),
                snull.alias("dc"),
                F.col("bin").alias("bucket"),
                F.col("lo").alias("first_v"),
                F.col("hi").alias("last_v"),
                dnull.alias("p50"),
                "n",
                dnull.alias("sum_v"),
                dnull.alias("avg_v"),
            )
        )
        .unionByName(
            anom.select(
                F.lit("anom").alias("variant"),
                "host",
                snull.alias("dc"),
                F.col("ts").alias("bucket"),
                F.col("value").alias("first_v"),
                r6_col(F.col("zscore")).alias("last_v"),
                dnull.alias("p50"),
                lnull.alias("n"),
                dnull.alias("sum_v"),
                dnull.alias("avg_v"),
            )
        )
        .unionByName(
            picks.select(
                F.lit("lttb").alias("variant"),
                snull.alias("host"),
                snull.alias("dc"),
                F.col("ts").alias("bucket"),
                F.col("value").alias("first_v"),
                dnull.alias("last_v"),
                dnull.alias("p50"),
                lnull.alias("n"),
                dnull.alias("sum_v"),
                dnull.alias("avg_v"),
            )
        )
    )


_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_BINS
_LTTB_NE = (
    f"CASE WHEN b + 2 <= {_LTTB_NOUT - 2} "
    f"THEN 1 + (b + 2) * {_LTTB_W} ELSE {_LTTB_N} END"
)

_q(
    "agg_grouped_variants",
    _agg_grouped_variants,
    # WITH RECURSIVE + the shared points CTE: the 'lttb' variant replays the
    # sequential bucket-pick (each pick depends on the previous one and the
    # next bucket's centroid) as a recursive CTE over the bucket index —
    # DuckDB list positions are 1-based where the kernel's numpy indices are
    # 0-based, hence the +1 shifts.
    "WITH RECURSIVE " + POINTS_CTE[len("WITH "):] + f""",
hist_src AS (
  SELECT value FROM points
  WHERE series = 'events.purchase' AND ts >= {T0} AND ts < {T1}
    AND value IS NOT NULL AND NOT isnan(value)
),
hist AS (
  SELECT least(greatest(CAST(floor((value - {_HIST_LO}) / {_HIST_W}) AS BIGINT), 0),
               {_HIST_BINS - 1}) AS bin,
         count(*) AS n
  FROM hist_src GROUP BY 1
),
err AS (
  SELECT host, ts, value FROM points
  WHERE series = 'events.error' AND ts >= {T0} AND ts < {T1}
    AND value IS NOT NULL AND NOT isnan(value)
),
astats AS (
  SELECT host, avg(value) AS mu, stddev_pop(value) AS sd FROM err GROUP BY host
),
anom AS (
  SELECT e.host, e.ts, e.value, round((e.value - mu) / sd, 6) AS z
  FROM err e JOIN astats USING (host)
  WHERE sd > 0 AND abs((e.value - mu) / sd) > {_ANOM_THRESHOLD}
),
lsub AS (
  SELECT ts, CAST(ts - {T0} AS DOUBLE) AS tsn, value FROM points
  WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1}
  ORDER BY ts, value LIMIT {_LTTB_N}
),
arr AS (
  SELECT list(tsn ORDER BY tsn, value) AS t,
         list(value ORDER BY tsn, value) AS v,
         list(ts ORDER BY tsn, value) AS ots
  FROM lsub
),
sel AS (
  SELECT 0 AS b, 1 AS prev
  UNION ALL
  SELECT b + 1, s0 + list_position(areas, list_max(areas))
  FROM (
    SELECT b, s0,
           list_transform(range(s0 + 1, s0 + {_LTTB_W} + 1), i ->
             abs((t[prev] - cx) * (v[i] - v[prev])
                 - (t[prev] - t[i]) * (cy - v[prev]))) AS areas
    FROM (
      SELECT b, prev, t, v, 1 + b * {_LTTB_W} AS s0,
             list_reduce(t[2 + (b + 1) * {_LTTB_W} : {_LTTB_NE}], (a, x) -> a + x)
               / len(t[2 + (b + 1) * {_LTTB_W} : {_LTTB_NE}]) AS cx,
             list_reduce(v[2 + (b + 1) * {_LTTB_W} : {_LTTB_NE}], (a, x) -> a + x)
               / len(v[2 + (b + 1) * {_LTTB_W} : {_LTTB_NE}]) AS cy
      -- len(t) guard: at scale factors too small to fill the 1002-point
      -- window the recursion must stop at b=0 (lpick's count guard already
      -- emits nothing) — list_avg tolerated the empty slices that arise
      -- then, list_reduce ERRORS on an empty list
      FROM sel, arr WHERE b < {_LTTB_NOUT - 2} AND len(t) = {_LTTB_N}
    ) q1
  ) q2
),
lpick AS (
  SELECT ots[prev] AS ts, v[prev] AS value FROM sel, arr
  WHERE (SELECT count(*) FROM lsub) = {_LTTB_N}
  UNION ALL
  SELECT ots[{_LTTB_N}], v[{_LTTB_N}] FROM arr
  WHERE (SELECT count(*) FROM lsub) = {_LTTB_N}
)
SELECT 'first_last' AS variant, host, dc,
       (ts // 86400) * 86400 AS bucket,
       first(value ORDER BY ts, value) AS first_v,
       last(value ORDER BY ts, value) AS last_v,
       {r6('quantile_cont(value, 0.5)')} AS p50, count(*) AS n,
       CAST(NULL AS DOUBLE) AS sum_v, CAST(NULL AS DOUBLE) AS avg_v
  FROM points
  WHERE series = 'events.purchase' AND ts >= {T0} AND ts < {T1} GROUP BY 2, 3, 4
UNION ALL
SELECT 'multi_key', host, dc, NULL, NULL, NULL, NULL,
       count(*), {r3('sum(value)')}, {r6('avg(value)')}
  FROM points
  WHERE series = 'events.view' AND ts >= {T0} AND ts < {T1} GROUP BY 2, 3
UNION ALL
SELECT 'hist', NULL, NULL, bin, {_HIST_LO} + bin * {_HIST_W},
       {_HIST_LO} + (bin + 1) * {_HIST_W}, NULL, n, NULL, NULL FROM hist
UNION ALL
SELECT 'anom', host, NULL, ts, value, {r6('z')}, NULL, NULL, NULL, NULL FROM anom
UNION ALL
SELECT 'lttb', NULL, NULL, ts, value, NULL, NULL, NULL, NULL, NULL FROM lpick""",
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
        f"{r6('(last(value ORDER BY ts, value) - first(value ORDER BY ts, value)) / (max(ts) - min(ts))')} END AS rate_v, "
        f"{r6('last(value ORDER BY ts, value) - first(value ORDER BY ts, value)')} AS delta_v FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1} GROUP BY 1, 2, 3"
    ),
)

_q(
    "agg_irate_integral",
    # one exact series: the per-series lag pre-pass must see the same row
    # sequence as the oracle's window; irate + trapezoid integral share it.
    # Round-13 rotation (VERDICT r12 item 4): counter-reset-aware
    # `increase` rides the same lag pre-pass — its DuckDB twin is the
    # lag-based positive-delta-or-post-reset-value sum (the series head's
    # NULL term is skipped by sum on both engines).
    ql(
        f"select time_bucket(86400, time) as bucket, {r6('irate(value)')} as irate_v, "
        f"{r3('integral(value)')} as area, {r3('increase(value)')} as inc_v "
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
           "CASE WHEN ts - pts > 0 AND pv IS NOT NULL THEN ts END)")} AS irate_v,
       {r3('sum((value + pv) / 2 * (ts - pts))')} AS area,
       {r3("sum(CASE WHEN pv IS NULL THEN NULL "
           "WHEN value >= pv THEN value - pv ELSE value END)")} AS inc_v
FROM l GROUP BY 1""",
)

# (`agg_multi_key` folded into `agg_grouped_variants` above — round-8
# consolidation to free a slot for `semantic_dedup`)


def _bucket_group_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three bucket-grouping shapes the reference grammar implies:
    GROUP BY select-alias (optimizer.zig:570-607), 3-arg time_bucket origin
    (functions.zig:314-324, registry-only there), and duration (`1h`) +
    ISO8601 timestamp literals (sydraql-design.md:92, never lexed there)."""
    eng = SydraQLEngine(spark, events_points(spark, sf_dir))
    a = eng.query(
        f"select time_bucket(7200, time) as b, count() as n from events.click "
        f"where time >= {T0} and time < {T1} group by b"
    ).df
    b = eng.query(
        f"select time_bucket(3600, time, 900) as b, count() as n from events.view "
        f"where time >= {T0} and time < {T1} group by time_bucket(3600, time, 900)"
    ).df
    c = eng.query(
        "select time_bucket(1h, time) as b, count() as n from events.click "
        "where time >= 2024-01-05T00:00:00Z and time < 2024-01-08T00:00:00Z "
        "group by time_bucket(1h, time)"
    ).df
    return (
        a.select(F.lit("alias_group").alias("variant"), "b", "n")
        .unionByName(b.select(F.lit("origin_3arg").alias("variant"), "b", "n"))
        .unionByName(c.select(F.lit("duration_iso").alias("variant"), "b", "n"))
    )


_q(
    "bucket_group_variants",
    _bucket_group_variants,
    oracle(
        f"""SELECT 'alias_group' AS variant, (ts // 7200) * 7200 AS b, count(*) AS n
  FROM points WHERE series = 'events.click' AND ts >= {T0} AND ts < {T1} GROUP BY 1, 2
UNION ALL
SELECT 'origin_3arg', ((ts - 900) // 3600) * 3600 + 900, count(*)
  FROM points WHERE series = 'events.view' AND ts >= {T0} AND ts < {T1} GROUP BY 1, 2
UNION ALL
SELECT 'duration_iso', (ts // 3600) * 3600, count(*)
  FROM points WHERE series = 'events.click'
    AND ts >= 1704412800 AND ts < 1704672000 GROUP BY 1, 2"""
    ),
)

# --- §2.5 window functions ----------------------------------------------------
_q(
    "window_lag_lead_ff",
    # lag / lead(,2) / fill_forward share one per-series window pre-pass
    # (value is never null here so ff == value; the null-patching path is
    # pinned by tests/test_engine_e2e.py)
    ql(
        f"select time, tag.host as host, tag.dc as dc, value, lag(value) as prev, "
        f"lead(value, 2) as nxt, fill_forward(value) as ff "
        f"from events.click where time >= {T0} and time < {D4}"
    ),
    oracle(
        f"SELECT ts AS time, host, dc, value, "
        f"lag(value) OVER w AS prev, lead(value, 2) OVER w AS nxt, value AS ff "
        f"FROM points WHERE series = 'events.click' AND ts >= {T0} AND ts < {D4} "
        f"WINDOW w AS (PARTITION BY series, host, dc ORDER BY ts, value)"
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

# ema oracle: the engine computes s_1 = x_1, s_i = α·x_i + (1-α)·s_{i-1} over
# (ts, value) order (pandas ewm(adjust=False); timeseries.with_ema). The
# oracle expands the recursion as a TRUNCATED weighted window — with α=0.5
# the closed form is s_i = Σ_{j>1} 0.5^(i-j+1)·v_j + 0.5^(i-1)·v_1, and terms
# more than EMA_TAIL=120 steps back carry weight 0.5^121 ≈ 4e-37, dozens of
# orders below double ulp, so the truncated double equals the recursion's up
# to summation-order noise (~1e-13) that the shared 9dp→6dp double rounding
# absorbs — the SAME stabilizer class as every other float entry. This keeps
# the oracle LINEAR in the series (range join, ≤121 terms/row) where the
# previous recursive CTE re-joined the whole series per row — O(n²), which
# the skew twin's 57k-row hot series turned into a >30-minute oracle stall
# (the engine side finished in seconds). Same lesson as the SemDeDup
# closure oracle: the oracle must stay linear-cost or the gate can't scale.
EMA_TAIL = 120
# the f/e CTE pair is shared with lifecycle's stream_stateful_ema_equiv,
# which appends its own Welford CTEs (r14 rotation) before a different
# final projection
EMA_CTES = f"""f AS (
  SELECT ts, value, CAST(row_number() OVER (ORDER BY ts, value) AS BIGINT) AS rn
  FROM points WHERE series = 'events.click' AND host = 'h0' AND dc = 'dc0'
    AND ts >= {T0} AND ts < {D7}
), e AS (
  SELECT fi.rn, fi.ts,
         sum(CASE WHEN fj.rn = 1 THEN power(0.5, fi.rn - 1) * fj.value
                  ELSE power(0.5, fi.rn - fj.rn + 1) * fj.value END) AS s
  FROM f fi JOIN f fj ON fj.rn BETWEEN fi.rn - {EMA_TAIL} AND fi.rn
  GROUP BY fi.rn, fi.ts
)"""
EMA_ORACLE = (
    POINTS_CTE
    + ",\n"
    + EMA_CTES
    + f"\nSELECT ts AS time, {r6('s')} AS ema_v FROM e"
)

_q(
    "window_ema",
    ql(
        f"select time, {r6('ema(value, 60, 0.5)')} as ema_v from events.click "
        f"where time >= {T0} and time < {D7} and tag.host = 'h0' and tag.dc = 'dc0'"
    ),
    EMA_ORACLE,
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

_FILL_QL = (
    f"select time_bucket(14400, time) as bucket, {r6('avg(value)')} as avg_v "
    f"from events.error where time >= {T0} and time < {T1} and value > 300 "
    f"group by time_bucket(14400, time)"
)


def _fill_sub(patch: str) -> str:
    """Standalone fill subquery (its own WITH, referencing the outer
    ``points`` CTE — DuckDB CTEs are lexically visible in subqueries)."""
    return f"""WITH agg AS (
  {_FILL_AGG}
), spine AS (
  SELECT unnest(generate_series((SELECT min(bucket) FROM agg),
                                (SELECT max(bucket) FROM agg), 14400)) AS bucket
), filled AS (
  SELECT s.bucket, {patch} FROM spine s LEFT JOIN agg a USING (bucket)
)
SELECT bucket, {r6('avg_v')} AS avg_v FROM filled"""


_FILL_GROUPED_SUB = f"""WITH agg AS (
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


def _fill_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fill(null) / fill(<constant>) / fill(previous) plus per-group
    previous-fill spines (fill_grouped); fill(linear) keeps its own headline
    entry. One engine, four queries, union with a strategy label."""
    eng = SydraQLEngine(spark, events_points(spark, sf_dir))
    nodc = F.lit(None).cast("string").alias("dc")
    parts = []
    for strategy, clause in (
        ("null", " fill(null)"),
        ("constant", " fill(0.0)"),
        ("previous", " fill(previous)"),
    ):
        df = eng.query(_FILL_QL + clause).df
        parts.append(
            df.select(F.lit(strategy).alias("strategy"), nodc, "bucket", "avg_v")
        )
    grouped = eng.query(
        f"select tag.dc as dc, time_bucket(43200, time) as bucket, "
        f"{r6('avg(value)')} as avg_v from events.purchase "
        f"where time >= {T0} and time < {T1} and value > 300 "
        f"group by tag.dc, time_bucket(43200, time) fill(previous)"
    ).df
    parts.append(
        grouped.select(
            F.lit("grouped_previous").alias("strategy"), "dc", "bucket", "avg_v"
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_q(
    "fill_strategies",
    _fill_strategies,
    oracle(
        f"""SELECT 'null' AS strategy, CAST(NULL AS VARCHAR) AS dc, bucket, avg_v
  FROM ({_fill_sub("a.avg_v AS avg_v")})
UNION ALL
SELECT 'constant', CAST(NULL AS VARCHAR), bucket, avg_v
  FROM ({_fill_sub("coalesce(a.avg_v, 0.0) AS avg_v")})
UNION ALL
SELECT 'previous', CAST(NULL AS VARCHAR), bucket, avg_v
  FROM ({_fill_sub(
      "last_value(a.avg_v IGNORE NULLS) OVER "
      "(ORDER BY s.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_v"
  )})
UNION ALL
SELECT 'grouped_previous', dc, bucket, avg_v FROM ({_FILL_GROUPED_SUB})"""
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

# --- §2.10 statements ---------------------------------------------------------
# (the in-memory INSERT→SELECT and DELETE→count entries are folded into the
# lifecycle module's `insert_durable_roundtrip` / `delete_durable` as labeled
# variants — round-6 consolidation to fit the driver's 50-entry cap)


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

# --- OneRow + aggregate semantics (§2.1 item 3, §2.4 items 21/28) -------------
# Round-6 consolidation of three single-row entries (former `onerow_literals`,
# `agg_empty_semantics`, `agg_global`) into one cross-joined row:
# - OneRow literal select: arithmetic precedence, '' escapes, division
# - empty-input NULL semantics: count() of nothing is 0, avg/min/max NULL
#   (events at every sf start ON T0, so [T0-1, T0) is a series-absent window)
# - global aggregate + expressions over aggregates (spread, half_avg)
def _onerow_agg_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = SydraQLEngine(spark, events_points(spark, sf_dir))
    one = eng.query(
        "select 1 as a, 2.5 as b, 'x''y' as c, 1 + 2 * 3 as d, "
        f"{r6('10 / 4')} as e"
    ).df
    empty = eng.query(
        f"select count() as e_n, count(value) as e_nv, {r6('avg(value)')} as e_avg_v, "
        f"min(value) as e_min_v, max(value) as e_max_v "
        f"from events.click where time >= {T0 - 1} and time < {T0}"
    ).df
    glob = eng.query(
        f"select count() as g_n, count(value) as g_nv, {r6('avg(value)')} as g_avg_v, "
        f"min(value) as g_min_v, max(value) as g_max_v, "
        f"{r6('max(value) - min(value)')} as spread, {r6('avg(value) / 2')} as half_avg "
        f"from events.signup where time >= {T0} and time < {T1}"
    ).df
    return one.crossJoin(empty).crossJoin(glob)


_q(
    "onerow_agg_semantics",
    _onerow_agg_semantics,
    oracle(
        "SELECT * FROM "
        "(SELECT CAST(1 AS BIGINT) AS a, 2.5 AS b, 'x''y' AS c, "
        "CAST(1 + 2 * 3 AS BIGINT) AS d, " + r6("10 / 4") + " AS e) "
        "CROSS JOIN ("
        f"SELECT count(*) AS e_n, count(value) AS e_nv, "
        f"{r6('avg(value)')} AS e_avg_v, min(value) AS e_min_v, "
        f"max(value) AS e_max_v FROM points "
        f"WHERE series = 'events.click' AND ts >= {T0 - 1} AND ts < {T0}"
        ") CROSS JOIN ("
        f"SELECT count(*) AS g_n, count(value) AS g_nv, "
        f"{r6('avg(value)')} AS g_avg_v, min(value) AS g_min_v, "
        f"max(value) AS g_max_v, {r6('max(value) - min(value)')} AS spread, "
        f"{r6('avg(value) / 2')} AS half_avg FROM points "
        f"WHERE series = 'events.signup' AND ts >= {T0} AND ts < {T1}"
        ")"
    ),
)
