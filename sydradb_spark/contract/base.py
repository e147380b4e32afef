"""Shared helpers for the driver-contract query catalog.

The driver runs each ``queries()`` entry on Spark and the matching
``oracle_sql()`` entry on DuckDB over the same parquet tables, then compares
row count + schema + order-insensitive value hash (CORRECTNESS_r{N}.json).

Two cross-engine determinism rules used throughout the catalog:

1. Float outputs are wrapped in ``r6`` — ``round(x * 1e6) / 1e6`` — on BOTH
   sides. Sums/averages of doubles are order-sensitive in the last ulp and
   Spark/DuckDB aggregate in different orders; 6 decimals is far above ulp
   noise and far below data scale.
2. Every LIMIT query carries a total ORDER BY (with tiebreaks) so both
   engines select the same rowset; full-result queries need no ordering
   because the driver's hash is order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sydradb_spark.sydraql.engine import SydraQLEngine
from sydradb_spark.tables import events_points

# events at every sf span 2024-01: full-month bounds plus sub-ranges.
T0 = 1704067200  # 2024-01-01 00:00:00 UTC
T1 = 1706745600  # 2024-02-01
D3 = T0 + 3 * 86400
D4 = T0 + 4 * 86400
D7 = T0 + 7 * 86400
MID = T0 + 15 * 86400

# DuckDB view of the same points mapping as tables.events_points:
# epoch_ns // 1e9 mirrors Spark's `ts div 1000000000` on the nanosAsLong read.
POINTS_CTE = """WITH points AS (
  SELECT 'events.' || event_type AS series,
         'h' || CAST(user_id % 5 AS VARCHAR) AS host,
         'dc' || CAST(user_id % 2 AS VARCHAR) AS dc,
         epoch_ns(ts) // 1000000000 AS ts,
         value,
         event_id AS seq
  FROM events
)"""


def rq(expr: str, dp: int = 6) -> str:
    """Cross-engine float stabilizer (same text is valid sydraQL and SQL).

    DOUBLE rounding, (dp+3)dp then dp: the two engines sum doubles in
    different orders, so a value sitting EXACTLY on the dp-decimal half
    boundary (common — window averages of 2-decimal inputs are
    small-denominator rationals) lands on either side by ~1e-13 noise and
    a single round() flips the last digit between engines (found by the
    sf1 gate: one moving_avg value differed by exactly 1e-6 on two
    different datasets). The (dp+3) pre-round absorbs the noise — both
    engines produce the IDENTICAL double — and the dp round of identical
    doubles agrees by construction. Residual risk moves to values exactly
    on the (dp+3)-decimal half boundary, ~1000x rarer.

    DOMAIN: valid only while |x| * 10^(dp+3) < 2^53 (|x| < ~9e6 for
    dp=6), else round() of the scaled value is an identity op and the
    pre-round silently stops absorbing noise. Entries whose values grow
    with data volume (whole-range sums) must pick dp by magnitude — dp=3
    holds to |x| < ~9e9, enough for a 1000x scale-up of the sf1 sums."""
    return f"{rq_open()}{expr}{rq_close(dp)}"


def rq_open() -> str:
    """Leading half of the ``rq()`` SQL text — for oracle f-strings whose
    stabilized expression contains quotes/backslashes that a Python 3.11
    f-string can't nest inside an ``{rq(...)}`` field. ALWAYS pair with
    ``rq_close(dp)``; the open half is dp-independent by construction, so
    the close half alone decides dp and a mismatched pairing is
    impossible."""
    return "round(round(("


def rq_close(dp: int = 6) -> str:
    """Trailing half of the ``rq()`` SQL text (see ``rq_open``)."""
    return f") * {10 ** (dp + 3)}) / 1000) / {10 ** dp}"


def rq_col(c, dp: int = 6):
    """Column-side twin of ``rq()`` — entries whose Spark half rounds with
    DataFrame expressions MUST quantize exactly like their SQL oracle, so
    the same (dp+3)-then-dp double rounding applies (a single F.round(c, dp)
    against a double-rounding oracle re-opens the half-boundary flip this
    scheme exists to close). Same magnitude domain as ``rq()``."""
    from pyspark.sql import functions as F

    if isinstance(c, str):
        c = F.col(c)
    return F.round(F.round(c * (10 ** (dp + 3))) / 1000) / (10**dp)


def r6(expr: str) -> str:
    """``rq(expr, 6)`` — the default stabilizer for bounded-magnitude
    values (averages, ratios, pointwise arithmetic of O(100) inputs)."""
    return rq(expr, 6)


def r6_col(c):
    """``rq_col(c, 6)`` — column-side twin of ``r6()``."""
    return rq_col(c, 6)


def r3(expr: str) -> str:
    """``rq(expr, 3)`` — for values that grow with data volume (whole-range
    ``sum(value)``), where dp=6's 9dp pre-round exceeds double resolution
    past |x| ~9e6 (hit by sf1 whole-range sums ~5e7)."""
    return rq(expr, 3)


def r3_col(c):
    """``rq_col(c, 3)`` — column-side twin of ``r3()``."""
    return rq_col(c, 3)


def events_slice(
    pts: DataFrame, event_type: str, t0: int | None, t1: int | None
) -> DataFrame:
    """Series + time-range filter over ``events_points`` output with the
    REDUNDANT raw-column predicates that actually reach the parquet scan:
    Catalyst cannot invert the ``'events.' || event_type`` concat or the
    ns→s timestamp mapping, so filtering the derived ``series``/``ts``
    columns alone scans every row group. The ``__ssrc``/``__ns``/``__tsr``
    hint columns (tables.events_points) carry the raw columns through the
    projection; the extra equalities/bounds here push as
    ``EqualTo(event_type,...)`` + ts range — same rewrite the sydraQL
    translator applies, for contract entries that filter the DataFrame
    directly (r12 explain audit: the hist/anom/lttb variants' scans showed
    only IsNotNull pushdowns before this)."""
    from pyspark.sql import functions as F

    cond = F.col("series") == f"events.{event_type}"
    if "__ssrc" in pts.columns:
        cond = cond & (F.col("__ssrc") == event_type)
    return events_time_slice(pts, t0, t1).where(cond)


def events_time_slice(
    pts: DataFrame, t0: int | None, t1: int | None
) -> DataFrame:
    """Time-range half of ``events_slice`` (for feeds that span several
    series): bounds on the derived ``ts`` PLUS the redundant raw-column
    bounds (``__ns`` long-nanos / ``__tsr`` timestamp) that actually push
    to the parquet scan."""
    from pyspark.sql import functions as F

    cond = F.lit(True)
    if t0 is not None:
        cond = cond & (F.col("ts") >= t0)
    if t1 is not None:
        cond = cond & (F.col("ts") < t1)
    if "__ns" in pts.columns:
        if t0 is not None:
            cond = cond & (F.col("__ns") >= t0 * 1_000_000_000)
        if t1 is not None:
            cond = cond & (F.col("__ns") < t1 * 1_000_000_000)
    elif "__tsr" in pts.columns:
        tsr_type = dict(pts.dtypes)["__tsr"]
        if t0 is not None:
            cond = cond & (
                F.col("__tsr") >= F.timestamp_seconds(F.lit(t0)).cast(tsr_type)
            )
        if t1 is not None:
            cond = cond & (
                F.col("__tsr") < F.timestamp_seconds(F.lit(t1)).cast(tsr_type)
            )
    return pts.where(cond)


def ql(*statements: str):
    """queries() entry: run sydraQL statements in order, return the last DF."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = SydraQLEngine(spark, events_points(spark, sf_dir))
        res = None
        for s in statements:
            res = eng.query(s)
        assert res is not None
        return res.df

    return run


def oracle(body: str) -> str:
    """oracle_sql() entry over the points CTE."""
    return f"{POINTS_CTE}\n{body}"
