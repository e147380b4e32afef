"""Mini-driver: every ``queries()`` entry vs its DuckDB oracle on REAL testdata.

Round 4 lost 33 catalog entries (and the whole bench) to a silent testdata
drift — events.parquet's ``ts`` flipped from timestamp[ns] to timestamp[us] —
that no local test caught, because nothing in tests/ read the real
/root/testdata parquet. This module closes that hole by mirroring the
driver's verify loop at sf0.001: run the Spark query, run the oracle SQL in
DuckDB over the same parquet files, and compare row count + column names +
order-insensitive values. Entries without an oracle get the driver's weaker
rows-only check (must execute and collect).

Set SPARK_GRAFT_TEST_SF to point at a different sf dir (default sf0.001 so
the whole catalog adds ~2-3 min, not more).
"""

from __future__ import annotations

import datetime
import math
import os
from decimal import Decimal

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} not present"
)

from sydradb_spark.contract import all_oracles, all_queries  # noqa: E402
from sydradb_spark.tables import TABLES  # noqa: E402

# generated oracles (ann_ivf_cosine) train their inlined literals from the
# sf dir this env var names; align it with the dir the harness queries.
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm(v):
    """Normalize one cell for cross-engine comparison (driver-hash spirit:
    floats already r6-rounded by the catalog; Decimal/float unified; floats
    bucketed to 6dp so ulp noise can't flip equality)."""
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _table(cols, rows):
    """(sorted column names, multiset of rows with columns sorted by name)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    # key=repr: rows may mix None with ints/floats, which plain tuple
    # comparison rejects; repr-order is deterministic and equality is still
    # checked on the actual normalized values.
    data = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )
    return names, data


def test_time_bounds_push_to_parquet_scan(spark):
    """Time-ranged queries must prune parquet row groups: the translator's
    redundant bound on the raw ts column (__ns long-nanos or __tsr
    timestamp, tables.normalize_events) has to survive into PushedFilters —
    at 100 TB this is the difference between a ranged read and a full scan."""
    from sydradb_spark.contract.base import D3, T0
    from sydradb_spark.sydraql.engine import SydraQLEngine
    from sydradb_spark.tables import events_points

    eng = SydraQLEngine(spark, events_points(spark, SF_DIR))
    df = eng.query(
        f"select time, value from events.click where time >= {T0} and time < {D3}"
    ).df
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # plan toString may truncate long filter lists with '…'; search the
    # whole text rather than a bracketed group.
    assert "PushedFilters: [" in plan, "no PushedFilters in events scan"
    pushed = plan.split("PushedFilters: [", 1)[1]
    assert "GreaterThanOrEqual(ts" in pushed or "GreaterThanOrEqual(__ns" in pushed, pushed[:300]
    # series selector must reach the scan via the raw source column too
    assert "EqualTo(event_type,click)" in pushed, pushed[:300]


def test_catalog_fits_driver_check_cap():
    """The driver checks at most 50 catalog entries per round; anything past
    the cap silently gets no CORRECTNESS row (round 5 shipped 57 entries and
    lost driver coverage of all of SURVEY §2.9 FILL). Consolidate entries
    into labeled unions before adding new ones — never exceed the cap."""
    assert len(QUERIES) <= 50, (
        f"contract catalog has {len(QUERIES)} entries; the driver only "
        "checks 50 — consolidate (labeled-union) before adding entries"
    )
    # every entry must have an oracle unless it is genuinely non-SQL-expressible
    assert set(QUERIES) == set(ORACLES)


def test_events_points_schema_and_count(spark):
    """Loader smoke on the real parquet: canonical schema regardless of the
    file's physical ts type (ns-as-long vs micros drifted once already)."""
    from sydradb_spark.tables import events_points

    pts = events_points(spark, SF_DIR)
    dt = dict(pts.dtypes)
    # canonical point columns plus with_identity's derived ones
    assert {"series", "tags", "ts", "value", "series_id", "hour_bucket"} <= set(dt)
    assert dt["ts"] == "bigint" and dt["value"] == "double"
    assert dt["series"] == "string" and dt["tags"] == "map<string,string>"
    assert pts.count() > 0


# Entries whose docstrings declare a deliberate brute-force/all-pairs path
# (small or broadcast side) — cartesian shapes are expected there.
# onerow_agg_semantics cross-joins three SINGLE-ROW aggregate frames (the
# round-6 consolidation); a 1x1x1 nested-loop join is the intended plan.
_BRUTE_OK = {
    "knn_cosine_brute",
    "near_dup_scores",  # carries the documented ngram_jaccard brute half
    "ann_ivf_cosine",
    "onerow_agg_semantics",
}


def _assert_plan_hygiene(name: str, df) -> None:
    """Anti-pattern guard on the physical plan: no accidental cartesian
    products outside the documented brute paths, and never row-at-a-time
    Python UDF eval (BatchEvalPython) — Arrow kernels (ArrowEvalPython,
    FlatMapGroupsInPandas, MapInPandas, ...) are the allowed Python shapes."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in _BRUTE_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: broadcast nested-loop join (unkeyed join?)"
        )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_catalog_entry_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    _assert_plan_hygiene(name, df)
    spark_rows = df.collect()
    spark_cols = df.columns

    sql = ORACLES.get(name)
    if sql is None:
        # driver's weaker rows-only check: executes, stable schema, >= 0 rows
        assert spark_cols
        assert len(spark_rows) >= 0
        return

    rel = duck.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    s_names, s_data = _table(spark_cols, spark_rows)
    d_names, d_data = _table(duck_cols, duck_rows)

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} oracle={len(duck_rows)}"
    )
    assert s_names == d_names, f"{name}: columns spark={s_names} oracle={d_names}"
    if s_data != d_data:
        diff = next(
            (i, a, b) for i, (a, b) in enumerate(zip(s_data, d_data)) if a != b
        )
        pytest.fail(f"{name}: value mismatch at sorted row {diff[0]}: "
                    f"spark={diff[1]} oracle={diff[2]}")


def test_rq_quantizer_cross_engine_all_magnitudes(spark):
    """The rq(dp) stabilizer must produce BIT-IDENTICAL doubles from DuckDB
    SQL text and Spark rq_col across its documented magnitude domain
    (|x| * 10^(dp+3) < 2^53) — including adversarial values sitting exactly
    on dp-decimal half boundaries with ±1-ulp noise, the case the double
    rounding exists to stabilize. r6 covers bounded-magnitude values; r3 is
    the whole-range-sum variant whose domain reaches ~9e9 (a 1000x
    scale-up of the sf1 sums that broke r6's 9dp pre-round)."""
    import math

    import duckdb

    from sydradb_spark.contract.base import rq, rq_col

    cases = []
    for mag in (0.0, 1.0, 837.25, 1e4, 5e5, 4.9e6, 5e7, 6.3e8, 5e9):
        for frac in (0.0005, 0.1234565, 0.015, 0.9999995):
            base = mag + frac
            cases.append(base)
            cases.append(math.nextafter(base, -math.inf))
            cases.append(math.nextafter(base, math.inf))
            cases.append(-base)
    con = duckdb.connect()
    for dp, max_abs in ((6, 9e6), (3, 9e9)):
        vals = [v for v in cases if abs(v) < max_abs]
        duck = [
            float(con.sql(f"SELECT {rq(f'CAST({v!r} AS DOUBLE)', dp)}").fetchone()[0])
            for v in vals
        ]
        sdf = spark.createDataFrame([(v,) for v in vals], "x double")
        got = [r[0] for r in sdf.select(rq_col("x", dp).alias("q")).collect()]
        for v, d, s in zip(vals, duck, got):
            assert d == s, f"dp={dp} x={v!r}: duckdb={d!r} spark={s!r}"
