"""Streaming decade soak (round 10, r9 verdict item 6).

The four streaming entries are correctness-certified at sf0.01; this
script is the scale evidence: replay a scale twin's events through the
Structured Streaming FILE source in arrival-ordered chunks, run the
watermarked windowed aggregate, and PIN the two properties that decide
whether the operator survives a decade-up:

- **bounded state**: the state store holds only open windows
  (series x windows-not-yet-past-watermark), NOT the input — max
  `numRowsTotal` across every micro-batch must stay orders of magnitude
  under the row count and must NOT grow with the replayed volume;
- **watermark accounting**: a deterministic 0.1% of rows are delayed by
  three chunks (hours of event time, far past the watermark) and every
  one must be dropped and accounted: `numRowsDroppedByWatermark` must
  equal the number of distinct late (series, window) groups per batch —
  the counter's native unit, since the state store sits behind the
  map-side partial aggregation (its per-batch values matched the
  distinct-group expectation exactly at sf1, 714/714);
- **checkpointed restart**: the query is killed mid-replay and restarted
  from its checkpoint; the final per-window aggregates must equal the
  batch twin computed over the non-straggler rows (exactly-once across
  the restart, at-least-once re-emission folded by last-update-wins).

Usage: python scripts/stream_soak.py [--sf-dir _scratch/sf1]
    [--chunks 24] [--kill-after 6] [--window "1 hour"]
    [--watermark "30 minutes"]
Prints ONE JSON line with the pinned metrics. The sf1 run is recorded in
SCALE_NOTES ("Round 10: streaming soak"); tests/test_streaming.py pins
the same three properties at pytest scale.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sydradb_spark.session import get_spark  # noqa: E402
from sydradb_spark.streaming.windowed import windowed_agg  # noqa: E402
from sydradb_spark.tables import events_points  # noqa: E402

STRAGGLER_MOD = 1000  # ~0.1% of rows become stragglers
STRAGGLER_DELAY_CHUNKS = 3


def interval_seconds(spec: str) -> int:
    """'30 minutes' → 1800. The soak's --window/--watermark flags are real:
    the late-group expectation and the batch twin below derive their bucket
    width from THIS, so a non-default window can't silently skew the
    drop-accounting or restart-equality verdicts (round-10 advice)."""
    n, unit = spec.strip().split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit.lower()]
    return int(n) * mult


def prepare_chunks(
    spark, sf_dir: str, src_dir: str, chunks: int, window_s: int = 3600
) -> dict:
    """Write the twin's events as `chunks` arrival-ordered parquet files.

    Chunk = contiguous event-time range (the file source replays oldest-
    mtime first, so arrival order == event-time order, the realistic
    ingest shape); a deterministic ~0.1% of rows from chunks that have a
    +3 target are delayed three chunks — hours of event time at any
    factor, so every straggler arrives with its window long closed.
    """
    pts = (
        events_points(spark, sf_dir)
        .select(F.col("series").alias("series_id"), "ts", "value")
    )
    lo, hi = pts.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo + 1) / chunks
    base = F.least(
        F.floor((F.col("ts") - F.lit(lo)) / F.lit(span)).cast("int"),
        F.lit(chunks - 1),
    )
    is_straggler = (F.xxhash64("series_id", "ts", "value") % STRAGGLER_MOD == 0) & (
        base <= chunks - 1 - STRAGGLER_DELAY_CHUNKS
    )
    tagged = pts.select(
        "series_id",
        "ts",
        "value",
        is_straggler.alias("straggler"),
        F.when(is_straggler, base + STRAGGLER_DELAY_CHUNKS)
        .otherwise(base)
        .alias("chunk"),
    ).persist()
    n_total = tagged.count()
    n_straggler = tagged.where("straggler").count()
    # numRowsDroppedByWatermark counts what the STATE STORE drops, and the
    # state store sits behind the partial (map-side) aggregation: late rows
    # are pre-merged per (series, window) within a micro-batch, so the
    # counter's unit is late GROUPS per batch, not late input rows
    # (verified empirically: per-batch drops == per-chunk distinct
    # (series, window) straggler groups, 714 vs 822 raw rows at sf1)
    n_late_groups = (
        tagged.where("straggler")
        .select("chunk", "series_id", F.floor(F.col("ts") / window_s).alias("w"))
        .distinct()
        .count()
    )

    os.makedirs(src_dir, exist_ok=True)
    tmp = f"{src_dir}__tmp"
    now = time.time()
    for i in range(chunks):
        (
            tagged.where(F.col("chunk") == i)
            .select("series_id", "ts", "value")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = f"{src_dir}/chunk_{i:04d}.parquet"
        shutil.move(part, dst)
        # the file source orders by modification time: stamp arrival order
        os.utime(dst, (now + i, now + i))
    shutil.rmtree(tmp, ignore_errors=True)
    tagged.unpersist()
    return {
        "rows": n_total,
        "stragglers": n_straggler,
        "late_groups": n_late_groups,
        "lo": lo,
        "hi": hi,
    }


def run_stream(
    spark,
    src_dir: str,
    ck_dir: str,
    sink: list,
    window: str,
    watermark: str,
    stop_after_batches: int | None,
) -> list[dict]:
    """One streaming run (availableNow); returns per-batch state metrics.

    With stop_after_batches the query is stopped mid-replay — the
    checkpoint makes the next call resume from the first unprocessed
    file, which is the restart half of the soak.
    """
    stream = (
        spark.readStream.schema("series_id string, ts long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        windowed_agg(stream, window=window, watermark=watermark)
        .writeStream.outputMode("update")
        .foreachBatch(lambda b, _id: sink.extend(b.collect()))
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    if stop_after_batches is None:
        q.awaitTermination()
    else:
        while q.isActive and len(q.recentProgress) < stop_after_batches:
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()
    out = []
    for p in q.recentProgress:
        for op in p["stateOperators"]:
            out.append(
                {
                    "batch": p["batchId"],
                    "state_rows": op["numRowsTotal"],
                    "dropped": op.get("numRowsDroppedByWatermark", 0),
                    "input_rows": p["numInputRows"],
                }
            )
    print(
        "# per-batch (batch, input, dropped, state): "
        + str([(o["batch"], o["input_rows"], o["dropped"], o["state_rows"]) for o in out]),
        file=sys.stderr,
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="_scratch/sf1")
    ap.add_argument("--work", default="_scratch/stream_soak")
    ap.add_argument("--chunks", type=int, default=24)
    ap.add_argument("--kill-after", type=int, default=6)
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--watermark", default="30 minutes")
    args = ap.parse_args()
    if not os.path.isdir(args.sf_dir):
        sys.exit(
            f"{args.sf_dir} missing — build it first: "
            f"python scripts/gen_sf.py --factor 10 --out {args.sf_dir}"
        )

    spark = get_spark("stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    window_s = interval_seconds(args.window)
    shutil.rmtree(args.work, ignore_errors=True)
    src_dir, ck_dir = f"{args.work}/src", f"{args.work}/ck"
    t0 = time.perf_counter()
    meta = prepare_chunks(spark, args.sf_dir, src_dir, args.chunks, window_s)
    t_prep = round(time.perf_counter() - t0, 1)

    emitted: list = []
    t0 = time.perf_counter()
    prog1 = run_stream(
        spark, src_dir, ck_dir, emitted, args.window, args.watermark, args.kill_after
    )
    prog2 = run_stream(
        spark, src_dir, ck_dir, emitted, args.window, args.watermark, None
    )
    t_stream = round(time.perf_counter() - t0, 1)
    prog = prog1 + prog2

    # last update per (series, bucket) wins (update mode + at-least-once
    # re-emission after the kill both re-send earlier values)
    final: dict = {}
    for r in emitted:
        final[(r["series_id"], r["bucket"])] = (
            r["cnt"],
            r["sum_v"],
            r["min_v"],
            r["max_v"],
        )

    # batch twin over the non-straggler rows (every straggler's window is
    # hours closed when it arrives, so the stream must have dropped ALL)
    pts = events_points(spark, args.sf_dir).select(
        F.col("series").alias("series_id"), "ts", "value"
    )
    keep = pts.where(
        ~(
            (F.xxhash64("series_id", "ts", "value") % STRAGGLER_MOD == 0)
            & (
                F.least(
                    F.floor(
                        (F.col("ts") - F.lit(meta["lo"]))
                        / F.lit((meta["hi"] - meta["lo"] + 1) / args.chunks)
                    ).cast("int"),
                    F.lit(args.chunks - 1),
                )
                <= args.chunks - 1 - STRAGGLER_DELAY_CHUNKS
            )
        )
    )
    want = {
        (r["series_id"], r["bucket"]): (r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in (
            keep.groupBy(
                "series_id",
                (F.floor(F.col("ts") / window_s) * window_s).alias("bucket"),
            )
            .agg(
                F.count("*").alias("cnt"),
                F.sum("value").alias("sum_v"),
                F.min("value").alias("min_v"),
                F.max("value").alias("max_v"),
            )
            .collect()
        )
    }
    def same(got, v):
        # cnt/min/max are exact; sum floats in stream vs batch accumulate in
        # different orders, so compare the sum at 1e-9 relative tolerance
        if got is None:
            return False
        return (
            got[0] == v[0]
            and abs(got[1] - v[1]) <= 1e-9 * max(1.0, abs(v[1]))
            and got[2] == v[2]
            and got[3] == v[3]
        )

    mismatch = sum(1 for k, v in want.items() if not same(final.get(k), v))
    extra = sum(1 for k in final if k not in want)
    examples = [
        {"key": list(k), "got": final.get(k), "want": v}
        for k, v in sorted(want.items())
        if not same(final.get(k), v)
    ][:5]
    if examples:
        print("MISMATCH EXAMPLES:", json.dumps(examples), file=sys.stderr)

    # a batch in flight at q.stop() is REPLAYED after the restart under the
    # same batchId — summing raw prog1+prog2 would count its watermark
    # drops twice; the last progress entry per batch is the one that
    # committed (round-10 advice)
    by_batch: dict = {}
    for p in prog:
        by_batch[p["batch"]] = p
    dropped_total = sum(p["dropped"] for p in by_batch.values())
    max_state = max((p["state_rows"] for p in by_batch.values()), default=0)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "rows": meta["rows"],
                "chunks": args.chunks,
                "stragglers_injected": meta["stragglers"],
                "straggler_groups": meta["late_groups"],
                "dropped_by_watermark": dropped_total,
                "drop_accounting_exact": dropped_total == meta["late_groups"],
                "max_state_rows": max_state,
                "state_rows_per_input_row": round(max_state / meta["rows"], 6),
                "batches": len(prog),
                "killed_after": args.kill_after,
                "restart_equals_batch": mismatch == 0 and extra == 0,
                "mismatched_windows": mismatch,
                "extra_windows": extra,
                "windows": len(want),
                "prep_s": t_prep,
                "stream_s": t_stream,
            }
        )
    )


if __name__ == "__main__":
    main()
