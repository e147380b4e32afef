"""Chunked window primitives == global per-series windows, on data spanning
many small chunks (seams, empty chunks, nulls, duplicate timestamps)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sydradb_spark.functions import chunked as ck


@pytest.fixture(scope="module")
def frame(spark):
    rows = []
    # two series; irregular cadence with gaps that leave whole chunks empty
    for sid in (1, 2):
        for i in range(200):
            ts = i * 7 + (500 if i >= 100 else 0)  # a 500s hole mid-series
            val = None if (sid == 2 and i % 11 == 0) else float(i * sid)
            rows.append((sid, ts, val))
    # duplicate timestamps with distinct values (tiebreak path)
    rows.append((1, 35, 3.5))
    rows.append((1, 35, 3.6))
    df = spark.createDataFrame(rows, "series_id long, ts long, value double")
    return df.cache()


def _collected(df, cols):
    return sorted(
        [tuple(r[c] for c in cols) for r in df.collect()],
        key=lambda t: tuple((x is None, x) for x in t),
    )


@pytest.mark.parametrize("n,kind", [(1, "lag"), (3, "lag"), (1, "lead"), (2, "lead")])
def test_chunked_lag_lead_matches_global(spark, frame, n, kind):
    w = Window.partitionBy("series_id").orderBy("ts", "value")
    fn = F.lag if kind == "lag" else F.lead
    expected = frame.withColumn("out", fn("value", n).over(w))
    got = ck.with_chunked_lag_lead(
        frame, [ck.LagRequest("value", "out", n, kind)], chunk_s=50
    )
    cols = ["series_id", "ts", "value", "out"]
    assert _collected(got, cols) == _collected(expected, cols)


def test_chunked_fill_forward_matches_global(spark, frame):
    w = (
        Window.partitionBy("series_id")
        .orderBy("ts", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expected = frame.withColumn("out", F.last("value", ignorenulls=True).over(w))
    got = ck.with_chunked_fill_forward(frame, "value", "out", chunk_s=50)
    cols = ["series_id", "ts", "value", "out"]
    assert _collected(got, cols) == _collected(expected, cols)


def test_chunked_moving_avg_matches_global(spark, frame):
    dur = 30
    w = (
        Window.partitionBy("series_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-dur, 0)
    )
    expected = frame.withColumn("out", F.avg("value").over(w))
    got = ck.with_chunked_moving_avg(frame, "value", "out", dur, chunk_s=50)
    cols = ["series_id", "ts", "value"]
    e = {t[:3]: t[3] for t in _collected(expected, cols + ["out"])}
    g = {t[:3]: t[3] for t in _collected(got, cols + ["out"])}
    assert e.keys() == g.keys()
    for k in e:
        if e[k] is None:
            assert g[k] is None
        else:
            assert g[k] == pytest.approx(e[k], rel=1e-12)


def test_chunked_ema_matches_pandas_global(spark, frame):
    alpha = 0.3
    src = frame.where(F.col("value").isNotNull())
    got = ck.with_chunked_ema(src, "value", "out", alpha, chunk_s=50)
    gdf = got.toPandas().sort_values(["series_id", "ts", "value"]).reset_index(drop=True)
    for sid, grp in gdf.groupby("series_id"):
        expected = (
            grp["value"].reset_index(drop=True).ewm(alpha=alpha, adjust=False).mean()
        )
        pd.testing.assert_series_equal(
            grp["out"].reset_index(drop=True),
            expected,
            check_names=False,
            rtol=1e-12,
        )


def test_chunked_moving_avg_negative_ts(spark):
    """Floor-division chunking: timestamps straddling 0 (pre-1970) land in
    properly aligned chunks, so the ghost re-emit still feeds lookback
    across the -chunk/0 boundary (the old trunc-toward-zero mod collapsed
    all of (-50, 50) into chunk 0 and skipped the re-emit)."""
    rows = [(1, ts, float(i)) for i, ts in enumerate(range(-120, 121, 7))]
    df = spark.createDataFrame(rows, "series_id long, ts long, value double")
    dur = 30
    w = (
        Window.partitionBy("series_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-dur, 0)
    )
    expected = df.withColumn("out", F.avg("value").over(w))
    got = ck.with_chunked_moving_avg(df, "value", "out", dur, chunk_s=50)
    e = {t[:2]: t[2] for t in _collected(expected, ["series_id", "ts", "out"])}
    g = {t[:2]: t[2] for t in _collected(got, ["series_id", "ts", "out"])}
    assert e.keys() == g.keys()
    for k in e:
        assert g[k] == pytest.approx(e[k], rel=1e-12)


def test_chunked_lag_negative_ts(spark):
    rows = [(1, ts, float(i)) for i, ts in enumerate(range(-120, 121, 7))]
    df = spark.createDataFrame(rows, "series_id long, ts long, value double")
    w = Window.partitionBy("series_id").orderBy("ts", "value")
    expected = df.withColumn("out", F.lag("value", 2).over(w))
    got = ck.with_chunked_lag_lead(
        df, [ck.LagRequest("value", "out", 2, "lag")], chunk_s=50
    )
    cols = ["series_id", "ts", "value", "out"]
    assert _collected(got, cols) == _collected(expected, cols)


@pytest.mark.parametrize("parts", [1, 3, 17])
def test_chunked_windows_survive_shuffled_input(spark, frame, parts):
    """Join-back keys are content-derived (probe key / per-chunk row_number),
    not monotonically_increasing_id, so an upstream shuffle with arbitrary
    partitioning — the retry-renumbering hazard ADVICE flagged — cannot
    mismatch kernel/probe rows to data rows."""
    shuffled = frame.repartition(parts, F.col("ts") % 5)

    dur = 30
    w = (
        Window.partitionBy("series_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-dur, 0)
    )
    expected = frame.withColumn("out", F.avg("value").over(w))
    got = ck.with_chunked_moving_avg(shuffled, "value", "out", dur, chunk_s=50)
    e = {t[:3]: t[3] for t in _collected(expected, ["series_id", "ts", "value", "out"])}
    g = {t[:3]: t[3] for t in _collected(got, ["series_id", "ts", "value", "out"])}
    assert e.keys() == g.keys()
    for k in e:
        if e[k] is None:
            assert g[k] is None
        else:
            assert g[k] == pytest.approx(e[k], rel=1e-12)

    src = shuffled.where(F.col("value").isNotNull())
    got_ema = ck.with_chunked_ema(src, "value", "out", 0.3, chunk_s=50)
    gdf = got_ema.toPandas().sort_values(["series_id", "ts", "value"]).reset_index(drop=True)
    for sid, grp in gdf.groupby("series_id"):
        expected_ema = (
            grp["value"].reset_index(drop=True).ewm(alpha=0.3, adjust=False).mean()
        )
        pd.testing.assert_series_equal(
            grp["out"].reset_index(drop=True),
            expected_ema,
            check_names=False,
            rtol=1e-12,
        )


def test_chunked_ema_duplicate_last_rows(spark):
    """Cross-chunk EMA carry picks each chunk's LAST row by position (__i),
    not by a (ts, value) struct — duplicate (ts, value) points at a chunk
    edge must not poison the carried state."""
    rows = []
    for i in range(40):
        rows.append((1, i * 5, float(i % 3)))
    rows.append((1, 45, 1.0))
    rows.append((1, 45, 0.0))  # exact duplicate of the i=9 row
    rows.append((1, 95, 1.0))
    rows.append((1, 95, 1.0))  # exact duplicate pair at a chunk_s=50 edge
    df = spark.createDataFrame(rows, "series_id long, ts long, value double")
    got = ck.with_chunked_ema(df, "value", "out", 0.3, chunk_s=50)
    gdf = got.toPandas().sort_values(["ts", "value"], kind="mergesort").reset_index(drop=True)
    expected = gdf["value"].ewm(alpha=0.3, adjust=False).mean()
    # FULLY identical rows (the (95, 1.0) triple) are interchangeable: the
    # engine may pair the tie group's ema values with its physical rows in
    # any order, and the physical order of a distributed result is not
    # stable across plan changes (r15: adding a checkpoint reshuffled it).
    # Sorting `out` alongside (ts, value) compares the tie group as a
    # multiset — exactly what the driver's order-insensitive hash oracle
    # checks — while rows with distinct (ts, value) stay position-pinned.
    gdf["__expected"] = expected
    gdf = gdf.sort_values(
        ["ts", "value", "out"], kind="mergesort"
    ).reset_index(drop=True)
    exp_sorted = (
        gdf.sort_values(["ts", "value", "__expected"], kind="mergesort")
        .reset_index(drop=True)["__expected"]
    )
    pd.testing.assert_series_equal(
        gdf["out"], exp_sorted, check_names=False, rtol=1e-12
    )


def test_chunked_stage_parallelism(spark):
    """The point of chunking: ONE series spread over many chunks must not
    collapse to a single window partition — per-chunk kernel groups are the
    unit of parallelism."""
    df = spark.range(0, 20_000).select(
        F.lit(1).alias("series_id"),
        F.col("id").alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    out = ck.with_chunked_lag_lead(
        df.repartition(8), [ck.LagRequest("value", "prev", 1, "lag")], chunk_s=1000
    )
    n_chunks = out.select((F.col("ts") - F.col("ts") % 1000).alias("c")).distinct().count()
    assert n_chunks == 20  # 20 bounded window partitions, not 1 per series
    w = Window.partitionBy("series_id").orderBy("ts", "value")
    expected = df.withColumn("eprev", F.lag("value").over(w))
    assert (
        out.join(expected, on=["series_id", "ts", "value"])
        .where(~F.col("prev").eqNullSafe(F.col("eprev")))
        .count()
        == 0
    )


def test_chunked_lag_property(spark):
    """Randomized seam fuzz: chunked lag equals the global window on random
    (ts, value, null) frames for every (n, chunk_s) combination."""
    import random

    rng = random.Random(17)
    for trial in range(4):
        rows = []
        for sid in (1, 2, 3):
            t = 0
            for _ in range(rng.randint(5, 120)):
                t += rng.randint(1, 40)
                v = None if rng.random() < 0.15 else round(rng.uniform(-5, 5), 3)
                rows.append((sid, t, v))
        df = spark.createDataFrame(rows, "series_id long, ts long, value double")
        n = rng.randint(1, 4)
        chunk_s = rng.choice([7, 25, 100])
        w = Window.partitionBy("series_id").orderBy("ts", "value")
        expected = df.withColumn("eout", F.lag("value", n).over(w))
        got = ck.with_chunked_lag_lead(
            df, [ck.LagRequest("value", "out", n, "lag")], chunk_s=chunk_s
        )
        diff = (
            got.join(expected, on=["series_id", "ts"])
            .where(~F.col("out").eqNullSafe(F.col("eout")))
            .count()
        )
        assert diff == 0, f"trial={trial} n={n} chunk_s={chunk_s}: {diff} mismatches"


def test_chunked_moving_avg_property(spark):
    """Randomized fuzz for the prefix-sum probe formulation: random frames,
    nulls, duplicate timestamps, random dur/chunk sizes vs the global
    RANGE-frame average."""
    import random

    rng = random.Random(23)
    for trial in range(3):
        rows = []
        for sid in (1, 2):
            t = 0
            for _ in range(rng.randint(10, 150)):
                t += rng.randint(0, 30)  # 0-step → duplicate timestamps
                v = None if rng.random() < 0.1 else round(rng.uniform(-9, 9), 3)
                rows.append((sid, t, v))
        df = spark.createDataFrame(rows, "series_id long, ts long, value double")
        dur = rng.choice([10, 45, 200])
        chunk_s = rng.choice([50, 120])
        w = (
            Window.partitionBy("series_id")
            .orderBy(F.col("ts").cast("long"))
            .rangeBetween(-dur, 0)
        )
        expected = df.withColumn("eout", F.avg("value").over(w))
        got = ck.with_chunked_moving_avg(df, "value", "out", dur, chunk_s=chunk_s)
        j = got.join(expected, on=["series_id", "ts", "value"])
        bad = j.where(
            ~(
                (F.col("out").isNull() & F.col("eout").isNull())
                | (F.abs(F.col("out") - F.col("eout")) < 1e-9)
            )
        ).count()
        assert bad == 0, f"trial={trial} dur={dur} chunk={chunk_s}: {bad} mismatches"


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_chunked_moving_avg_random_shapes(spark, seed):
    """Randomized armor for the prefix-difference rewrite: irregular cadence,
    duplicate timestamps, nulls, negative ts, dur vs chunk ratios — chunked
    must equal the naive global RANGE frame everywhere."""
    import random

    rng = random.Random(seed)
    dur = rng.choice([7, 30, 55])
    chunk_s = rng.choice([20, 50, 64])
    rows = []
    for sid in (0, 1):
        t = -rng.randint(0, 100)
        for _ in range(rng.randint(40, 120)):
            t += rng.choice([0, 1, 2, 3, 5, 11, 40])  # 0 → duplicate ts
            v = None if rng.random() < 0.1 else round(rng.uniform(-5, 5), 3)
            rows.append((sid, t, v))
    df = spark.createDataFrame(rows, "series_id long, ts long, value double")
    w = (
        Window.partitionBy("series_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-dur, 0)
    )
    expected = df.withColumn("out", F.avg("value").over(w))
    got = ck.with_chunked_moving_avg(df, "value", "out", dur, chunk_s=chunk_s)
    cols = ["series_id", "ts", "value"]
    e = sorted(
        _collected(expected, cols + ["out"]), key=lambda t: (t[0], t[1], repr(t[2]))
    )
    g = sorted(
        _collected(got, cols + ["out"]), key=lambda t: (t[0], t[1], repr(t[2]))
    )
    assert len(e) == len(g)
    for (te, ge) in zip(e, g):
        assert te[:3] == ge[:3]
        if te[3] is None:
            assert ge[3] is None
        else:
            assert ge[3] == pytest.approx(te[3], rel=1e-12)


def test_tie_determinism_first_last_lag_lead(spark):
    """Second-resolution ts ties (found by the sf1 gate) must produce
    deterministic, oracle-matching results: first/last break ties by value
    (struct key), and chunked lag/lead derive every ordering from ONE
    canonical row number — no mid-run nulls when duplicates exist."""
    from pyspark.sql import functions as F

    from sydradb_spark.functions import timeseries as ts_fn
    from sydradb_spark.functions.chunked import LagRequest, with_chunked_lag_lead

    rows = [
        ("s", 100, 5.0), ("s", 100, 2.0), ("s", 100, 2.0),  # 3-way ts tie
        ("s", 200, 9.0), ("s", 200, 1.0),                    # 2-way ts tie
        ("s", 300, 7.0),
    ]
    df = spark.createDataFrame(rows, "series_id string, ts long, value double")
    agg = df.agg(
        ts_fn.first_agg(F.col("value"), F.col("ts")).alias("f"),
        ts_fn.last_agg(F.col("value"), F.col("ts")).alias("l"),
        ts_fn.delta_agg(F.col("value"), F.col("ts")).alias("d"),
    ).collect()[0]
    # earliest ts=100 -> smallest value 2.0; latest ts=300 unique -> 7.0
    assert (agg["f"], agg["l"], agg["d"]) == (2.0, 7.0, 5.0)

    out = with_chunked_lag_lead(
        df,
        [LagRequest("value", "prev", 1, "lag"), LagRequest("value", "nxt", 2, "lead")],
        chunk_s=150,  # ties straddle a chunk boundary too
    ).orderBy("ts", "value").collect()
    # canonical (ts, value) order: 2.0, 2.0, 5.0, 1.0, 9.0, 7.0
    assert [r["value"] for r in out] == [2.0, 2.0, 5.0, 1.0, 9.0, 7.0]
    assert [r["prev"] for r in out] == [None, 2.0, 2.0, 5.0, 1.0, 9.0]
    assert [r["nxt"] for r in out] == [5.0, 1.0, 9.0, 7.0, None, None]


def test_chunked_ema_null_values_excluded_and_boundary_invariant(spark):
    """r13 review: null observations must not enter the EMA recursion —
    in-chunk pandas renormalized around NaNs while the cross-chunk carry
    decayed by the TOTAL row count, so the answer depended on where the
    chunk boundary fell. Nulls now pass through with a null EMA and the
    observed-value recursion is chunk-invariant."""
    from sydradb_spark.functions.chunked import with_chunked_ema

    rows = [(1, 0, 1.0), (1, 5000, None), (1, 9000, 2.0)]
    df = spark.createDataFrame(rows, "series_id long, ts long, value double")

    def ema(chunk_s):
        out = with_chunked_ema(df, "value", "ema", alpha=0.5, chunk_s=chunk_s)
        return {r["ts"]: r["ema"] for r in out.collect()}

    # one chunk vs a boundary between the null and the second observation
    wide, narrow = ema(1_000_000), ema(4096)
    expected = {0: 1.0, 5000: None, 9000: 0.5 * 2.0 + 0.5 * 1.0}
    for got in (wide, narrow):
        assert got[0] == expected[0]
        assert got[5000] is None
        assert got[9000] == pytest.approx(expected[9000])
