"""Scale smoke: generate a ~10M-point hour-partitioned table and measure the
core paths — empirical evidence the partition strategy holds at 2-3 orders of
magnitude above the driver testdata.

Usage: python scripts/scale_smoke.py [n_points] [table_dir]
Writes timings to stdout; the table lands under _scratch (gitignored).

What it demonstrates:
- write path: one shuffle into ~N_HOURS partition dirs;
- pruned scan: a 2-hour query over a 278-hour table should read ~2/278 of
  the files (wall-clock gap vs the full scan is the proof);
- bucket aggregation throughput (points/sec) vs the reference's 500k-1M
  points/sec/core design target;
- compaction and rollup build as whole-table batch jobs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sydradb_spark import storage
from sydradb_spark.model import with_identity
from sydradb_spark.rollup import build_rollup
from sydradb_spark.session import get_spark
from sydradb_spark.sydraql.engine import SydraQLEngine


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    table = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/_scratch/scale_points"
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    base = spark.range(n).select(
        F.concat(F.lit("m.s"), (F.col("id") % 100).cast("string")).alias("series"),
        F.create_map(
            F.lit("host"), F.concat(F.lit("h"), (F.col("id") % 7).cast("string"))
        ).alias("tags"),
        (F.col("id") % 1_000_000 + 1_700_000_000).alias("ts"),  # ~278 hours
        (F.rand(seed=1) * 100).alias("value"),
    )
    storage.write_points(with_identity(base), table, mode="overwrite")
    t_write = time.time() - t0
    n_parts = len([d for d in os.listdir(table) if d.startswith("hour_bucket=")])
    print(f"write {n:,} points → {n_parts} hour partitions: {t_write:.1f}s "
          f"({n/t_write/1e6:.2f}M pts/s)")

    eng = SydraQLEngine(spark, storage_path=table)

    t0 = time.time()
    n_full = eng.query(
        "select count() as n from m.s1 where time >= 1700000000 and time < 1701000000"
    ).df.collect()[0][0]
    t_full = time.time() - t0
    t0 = time.time()
    n_pruned = eng.query(
        "select count() as n from m.s1 where time >= 1700000000 and time < 1700007200"
    ).df.collect()[0][0]
    t_pruned = time.time() - t0
    print(f"full-range count ({n_full:,} rows): {t_full:.2f}s; "
          f"2h pruned count ({n_pruned:,} rows): {t_pruned:.2f}s "
          f"(pruning speedup {t_full/max(t_pruned,1e-9):.1f}x)")

    t0 = time.time()
    rows = eng.query(
        "select time_bucket(3600, time) as b, avg(value) as a, count() as n "
        "from m.s1 where time >= 1700000000 and time < 1701000000 "
        "group by time_bucket(3600, time)"
    ).df.collect()
    t_agg = time.time() - t0
    print(f"hourly agg over {n_full:,} pts → {len(rows)} buckets: {t_agg:.2f}s "
          f"({n_full/t_agg/1e6:.2f}M pts/s for one series; whole-table rate below)")

    t0 = time.time()
    r = build_rollup(storage.read_points(spark, table), step_s=3600)
    n_rollup = r.count()
    t_roll = time.time() - t0
    print(f"rollup build over all {n:,} pts → {n_rollup:,} rows: {t_roll:.1f}s "
          f"({n/t_roll/1e6:.2f}M pts/s)")

    t0 = time.time()
    n_compact = storage.compact_points(storage.read_points(spark, table)).count()
    t_comp = time.time() - t0
    print(f"compaction dedup scan: {n_compact:,} rows kept: {t_comp:.1f}s "
          f"({n/t_comp/1e6:.2f}M pts/s)")

    window_smoke(spark, n)


def window_smoke(spark, n: int) -> None:
    """ONE hot series with n points — the shape that binds to a single task
    under a plain per-series window. The chunked primitives must spread it
    over ~n/86400 window partitions and keep multi-task throughput."""
    from sydradb_spark.functions import chunked as ck

    hot = spark.range(n).select(
        F.lit("m.hot").alias("series"),
        F.create_map(F.lit("host"), F.lit("h0")).alias("tags"),
        (F.col("id") + 1_700_000_000).alias("ts"),  # 1 Hz
        (F.rand(seed=2) * 100).alias("value"),
    )
    pts = with_identity(hot).persist()
    pts.count()
    n_chunks = n // ck.WINDOW_CHUNK_S + 1

    t0 = time.time()
    lagged = ck.with_chunked_lag_lead(
        pts, [ck.LagRequest("value", "prev", 1, "lag")]
    )
    n_prev = lagged.where(F.col("prev").isNotNull()).count()
    t_lag = time.time() - t0
    print(f"chunked lag, ONE {n:,}-pt series → {n_chunks} window partitions: "
          f"{t_lag:.1f}s ({n/t_lag/1e6:.2f}M pts/s; plain window = 1 task); "
          f"{n_prev:,} predecessors")

    t0 = time.time()
    ema = ck.with_chunked_ema(pts, "value", "ema", alpha=0.5)
    s = ema.agg(F.sum("ema")).collect()[0][0]
    t_ema = time.time() - t0
    print(f"segmented ema, same series: {t_ema:.1f}s ({n/t_ema/1e6:.2f}M pts/s); "
          f"checksum {s:.3f}")

    t0 = time.time()
    ma = ck.with_chunked_moving_avg(pts, "value", "ma", dur_s=3600)
    s = ma.agg(F.sum("ma")).collect()[0][0]
    t_ma = time.time() - t0
    print(f"chunked moving_avg(1h), same series: {t_ma:.1f}s "
          f"({n/t_ma/1e6:.2f}M pts/s); checksum {s:.3f}")
    pts.unpersist()




def dedup_scale(mult: int = 10, sf_dir: str = "/root/testdata/sf0.1") -> None:
    """``python scripts/scale_smoke.py --dedup [mult]`` — the SCALE_NOTES
    minhash measurement: mult× the sf0.1 documents corpus (replica texts
    tag-mutated so near-dup groups really span replicas), full
    shingle → MinHash → LSH → exact-Jaccard-verify pipeline."""
    from sydradb_spark.pipeline import dedup
    from sydradb_spark.tables import load_table

    spark = get_spark("dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    big = (
        spark.range(mult)
        .crossJoin(base)
        .select(
            (F.col("doc_id") + F.col("id") * 1_000_000).alias("doc_id"),
            F.when(F.col("id") == 0, F.col("text"))
            .otherwise(F.concat(F.col("id").cast("string"), F.lit(" "), F.col("text")))
            .alias("text"),
        )
    ).persist()
    n = big.count()
    t0 = time.time()
    pairs = dedup.minhash_near_dups(big, threshold=0.2).count()
    dt = time.time() - t0
    print(
        f"minhash near-dups over {n:,} docs ({mult}x {sf_dir}): "
        f"{dt:.1f}s ({n / dt:.0f} docs/s), {pairs} verified pairs >= 0.2"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--dedup":
        dedup_scale(int(sys.argv[2]) if len(sys.argv) > 2 else 10)
    else:
        main()
