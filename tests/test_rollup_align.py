"""Rollup combination losslessness + time-alignment semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sydradb_spark import rollup as rl
from sydradb_spark.functions.align import aligned, asof_join


def test_rollup_combine_lossless(spark, points):
    hourly = rl.build_rollup(points, step_s=3600)
    daily = rl.rollup_answer(rl.combine_rollup(hourly, step_s=86400))
    direct = (
        points.groupBy(
            "series_id", ((F.col("ts") / 86400).cast("long") * 86400).alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_v"),
            F.avg("value").alias("avg_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    j = daily.alias("d").join(direct.alias("x"), on=["series_id", "bucket"])
    assert j.count() == direct.count() == daily.count()
    bad = j.where(
        (F.col("d.n") != F.col("x.n"))
        | (F.abs(F.col("d.sum_v") - F.col("x.sum_v")) > 1e-9)
        | (F.abs(F.col("d.avg_v") - F.col("x.avg_v")) > 1e-9)
        | (F.col("d.min_v") != F.col("x.min_v"))
        | (F.col("d.max_v") != F.col("x.max_v"))
    )
    assert bad.count() == 0


def test_aligned_inner(spark, points):
    out = aligned(points, "weather.room1", "cpu.total", step_s=3600).collect()
    assert len(out) >= 1
    for r in out:
        assert r["a"] is not None and r["b"] is not None


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 1.0), (1, 205, 2.0), (1, 300, 3.0)],
        "series_id long, ts long, value double",
    )
    right = spark.createDataFrame(
        [(1, 90, 10.0), (1, 205, 20.0), (1, 290, 30.0)],
        "series_id long, ts long, value double",
    )
    out = {r["ts"]: (r["right_value"], r["right_ts"]) for r in asof_join(left, right).collect()}
    assert out[100] == (10.0, 90)
    assert out[205] == (20.0, 205)  # equal ts matches (at-or-before inclusive)
    assert out[300] == (30.0, 290)

    # tolerance: match further back than 50s is nulled
    out2 = {
        r["ts"]: r["right_value"]
        for r in asof_join(left, right, tolerance_s=5).collect()
    }
    assert out2[100] is None and out2[205] == 20.0


def _rollup_engine(spark, points, points_override=None):
    from sydradb_spark.model import POINTS_SCHEMA
    from sydradb_spark.sydraql.engine import SydraQLEngine

    r = rl.build_rollup(points, step_s=3600)
    pts = points_override if points_override is not None else points
    return SydraQLEngine(spark, pts, rollup=r, rollup_step=3600)


def test_rollup_rewrite_serves_from_rollup(spark, points):
    """Empty raw points + populated rollup: a hit proves the rewrite ran."""
    from sydradb_spark.model import POINTS_SCHEMA

    empty = spark.createDataFrame([], POINTS_SCHEMA)
    eng = _rollup_engine(spark, points, points_override=empty)
    rows = eng.query(
        "select time_bucket(7200, time) as b, avg(value) as a, count() as n, "
        "min(value) as mn, max(value) as mx, first(value) as fv, last(value) as lv "
        "from cpu.total where time >= 997200 and time < 1004400 "
        "group by time_bucket(7200, time)"
    ).df.collect()
    assert rows, "rollup path not taken (raw points are empty)"


def test_rollup_rewrite_matches_raw(spark, points):
    q = (
        "select time_bucket(7200, time) as b, avg(value) as a, count() as n, "
        "min(value) as mn, max(value) as mx, first(value) as fv, last(value) as lv "
        "from weather.room1 where time >= 997200 and time < 1004400 "
        "group by time_bucket(7200, time) order by b"
    )
    from sydradb_spark.sydraql.engine import SydraQLEngine

    raw = SydraQLEngine(spark, points).query(q).df.collect()
    rolled = _rollup_engine(spark, points).query(q).df.collect()
    assert len(raw) == len(rolled) > 0
    for r0, r1 in zip(raw, rolled):
        assert r0["b"] == r1["b"] and r0["n"] == r1["n"]
        assert r0["mn"] == r1["mn"] and r0["mx"] == r1["mx"]
        assert r0["fv"] == r1["fv"] and r0["lv"] == r1["lv"]
        assert abs(r0["a"] - r1["a"]) < 1e-9


@pytest.mark.parametrize(
    "q",
    [
        # value predicate → row detail needed
        "select time_bucket(7200, time) as b, avg(value) as a from cpu.total "
        "where time >= 997200 and time < 1004400 and value > 5 group by time_bucket(7200, time)",
        # unaligned bound
        "select time_bucket(7200, time) as b, avg(value) as a from cpu.total "
        "where time >= 997201 and time < 1004400 group by time_bucket(7200, time)",
        # step not a multiple of the rollup step
        "select time_bucket(5400, time) as b, avg(value) as a from cpu.total "
        "where time >= 997200 and time < 1004400 group by time_bucket(5400, time)",
        # percentile not associative
        "select time_bucket(7200, time) as b, percentile(value, 0.5) as p from cpu.total "
        "where time >= 997200 and time < 1004400 group by time_bucket(7200, time)",
    ],
)
def test_rollup_rewrite_falls_back(spark, points, q):
    """Ineligible queries run the raw path: with empty raw points they
    return no rows (proving the rollup was NOT consulted)."""
    from sydradb_spark.model import POINTS_SCHEMA

    empty = spark.createDataFrame([], POINTS_SCHEMA)
    eng = _rollup_engine(spark, points, points_override=empty)
    assert eng.query(q).df.collect() == []


def test_rollup_invalidated_after_write(spark, points):
    """Insert-then-bucketed-aggregate must see the written rows: a write
    invalidates the materialized rollup (ADVICE r02: stale-rollup serving)."""
    eng = _rollup_engine(spark, points)
    q = (
        "select time_bucket(7200, time) as b, count() as n from cpu.total "
        "where time >= 997200 and time < 1004400 group by time_bucket(7200, time)"
    )
    before = {r["b"]: r["n"] for r in eng.query(q).df.collect()}
    eng.query("insert into cpu.total (time, value) values (1000001, 1.0)")
    assert eng.rollup is None
    after = {r["b"]: r["n"] for r in eng.query(q).df.collect()}
    bucket = (1000001 // 7200) * 7200
    assert after[bucket] == before[bucket] + 1


def test_asof_tie_on_right_ts_is_max_value(spark):
    """Multiple right rows at the same ts: the carried value is the max —
    deterministic and matching the contract oracle's ORDER BY value DESC."""
    from sydradb_spark.functions.align import asof_join

    left = spark.createDataFrame([(1, 200, 1.0)], "series_id long, ts long, value double")
    right = spark.createDataFrame(
        [(1, 100, 7.0), (1, 100, 3.0), (1, 100, 9.0)],
        "series_id long, ts long, value double",
    )
    for _ in range(3):
        out = asof_join(left, right).collect()
        assert len(out) == 1 and out[0]["right_value"] == 9.0


def test_rollup_rewrite_serves_aligned_origin(spark, points):
    """3-arg time_bucket with origin % step == 0 produces exactly the 2-arg
    buckets, so the rollup serves it (r10 verdict item 8). Empty raw points:
    rows prove the rollup path ran; values must equal the 2-arg twin."""
    from sydradb_spark.model import POINTS_SCHEMA
    from sydradb_spark.sydraql.engine import SydraQLEngine

    empty = spark.createDataFrame([], POINTS_SCHEMA)
    eng = _rollup_engine(spark, points, points_override=empty)
    rows = eng.query(
        "select time_bucket(7200, time, 993600) as b, avg(value) as a, count() as n "
        "from cpu.total where time >= 997200 and time < 1004400 "
        "group by time_bucket(7200, time, 993600)"
    ).df.collect()
    assert rows, "aligned-origin rollup path not taken (raw points are empty)"
    # equality against the raw 2-arg computation on the REAL points
    raw = SydraQLEngine(spark, points).query(
        "select time_bucket(7200, time) as b, avg(value) as a, count() as n "
        "from cpu.total where time >= 997200 and time < 1004400 "
        "group by time_bucket(7200, time) order by b"
    ).df.collect()
    got = {r["b"]: (r["n"], round(r["a"], 9)) for r in rows}
    want = {r["b"]: (r["n"], round(r["a"], 9)) for r in raw}
    assert got == want


def test_rollup_rewrite_falls_back_misaligned_origin(spark, points):
    """origin NOT a multiple of the step shifts bucket boundaries — must
    fall back to the raw path (empty raw points -> no rows)."""
    from sydradb_spark.model import POINTS_SCHEMA

    empty = spark.createDataFrame([], POINTS_SCHEMA)
    eng = _rollup_engine(spark, points, points_override=empty)
    assert (
        eng.query(
            "select time_bucket(7200, time, 993601) as b, avg(value) as a "
            "from cpu.total where time >= 997200 and time < 1004400 "
            "group by time_bucket(7200, time, 993601)"
        ).df.collect()
        == []
    )


@pytest.mark.parametrize("agg", ["avg(value)", "sum(value)", "count()",
                                 "min(value)", "max(value)", "first(value)", "last(value)"])
@pytest.mark.parametrize("bucket", [
    "time_bucket(3600, time)",          # step == rollup step
    "time_bucket(7200, time)",          # coarsening
    "time_bucket(7200, time, 993600)",  # aligned 3-arg origin (r11)
    "time_bucket(10800, time, 0)",      # aligned origin 0, 3x step
])
def test_rollup_rewrite_equality_sweep(spark, points, agg, bucket):
    """Every (aggregate x bucket shape) the rewrite claims eligible must
    return exactly what the raw path returns — the rollup is an invisible
    optimization, never a semantics change."""
    from sydradb_spark.sydraql.engine import SydraQLEngine

    q = (
        f"select {bucket} as b, {agg} as v from weather.room1 "
        f"where time >= 993600 and time < 1008000 group by {bucket} order by b"
    )
    raw = SydraQLEngine(spark, points).query(q).df.collect()
    rolled = _rollup_engine(spark, points).query(q).df.collect()
    assert len(raw) == len(rolled) > 0, q
    for r0, r1 in zip(raw, rolled):
        assert r0["b"] == r1["b"], q
        if isinstance(r0["v"], float):
            assert r1["v"] == pytest.approx(r0["v"], rel=1e-12), q
        else:
            assert r0["v"] == r1["v"], q


def test_combine_rollup_tie_break_matches_build(spark):
    """r13 review: partials of one bucket sharing the same first_ts/last_ts
    whole second must combine to build_rollup's struct(ts, value) pick —
    the bare-ts ordering chose whichever partial arrived first."""
    from sydradb_spark.rollup import build_rollup, combine_rollup

    def pts(rows):
        return spark.createDataFrame(
            rows, "series string, ts long, value double"
        ).selectExpr(
            "xxhash64(series) as series_id", "series", "map() as tags",
            "ts", "value", "cast(floor(ts/3600)*3600 as long) as hour_bucket",
        )

    # two same-second points split across two partials, both bucket 0
    a = pts([("s.a", 100, 5.0), ("s.a", 200, 7.0)])
    b = pts([("s.a", 100, 3.0), ("s.a", 200, 9.0)])
    combined = combine_rollup(
        build_rollup(a).unionByName(build_rollup(b)), 3600
    ).collect()[0]
    oneshot = build_rollup(a.unionByName(b)).collect()[0]
    assert combined["first_v"] == oneshot["first_v"] == 3.0  # min (ts, value)
    assert combined["last_v"] == oneshot["last_v"] == 9.0  # max (ts, value)
    assert combined["cnt"] == 4 and combined["cnt_v"] == 4


def test_rollup_avg_null_safe(spark):
    """r13 review: avg served from the rollup must divide by the non-null
    value count (cnt_v) — sum_v/cnt diverged from F.avg on null values."""
    from pyspark.sql import functions as F

    from sydradb_spark.rollup import build_rollup, rollup_answer

    pts = spark.createDataFrame(
        [("s.a", 100, 2.0), ("s.a", 200, None)],
        "series string, ts long, value double",
    ).selectExpr(
        "xxhash64(series) as series_id", "series", "map() as tags",
        "ts", "value", "cast(floor(ts/3600)*3600 as long) as hour_bucket",
    )
    ans = rollup_answer(build_rollup(pts)).collect()[0]
    raw = pts.agg(F.avg("value"), F.count("*"), F.count("value")).first()
    assert ans["avg_v"] == raw[0] == 2.0  # not 1.0
    assert ans["n"] == raw[1] == 2  # count() still counts rows
