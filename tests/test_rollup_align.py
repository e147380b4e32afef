"""Rollup combination losslessness + time-alignment semantics."""

from __future__ import annotations

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
