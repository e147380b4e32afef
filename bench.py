"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE COMPACT JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "calibration": ..., "comparable_to_prev": {...}}

The stdout line is kept COMPACT on purpose: the driver records only the
tail of the run (~2000 chars) and parses the JSON line out of it — rounds
8-9 shipped a ~7 KB line carrying per-query detail blocks, which the
driver truncated and recorded as ``parsed: null``. The full
self-describing payload (per-query runs/rows/cols, index_split,
storage_mode) now goes to stderr and to ``.scratch/bench_detail.json``.

``queries`` stays the flat name->seconds map the driver records, and
``comparable_to_prev`` names FROZEN like-for-like subtotals (explicit
per-round name lists, r9 verdict finding 2 — the old code recorded the
full current total under a stale set name, which read as a 20% regression
when the truly common queries were ~9% faster) so round-over-round diffs
need no forensics.

Queries run through the same ``__spark_entry__.queries()`` callables the
correctness gate checks — the benchmark measures the real operator surface,
not a tuned copy of it. A warm-up query amortizes JVM/session startup out of
the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family (scan, bucket agg, rate family,
# window, fill, top-k, dedup exact + LSH, ANN, text analysis, end-to-end
# curation and doc chunking — both added round 6, so r03/r05 totals compare
# like-for-like only after subtracting them; per-query timings in the json
# stay comparable).
HEADLINE = [
    "corpus_curation",
    "doc_chunking",
    "scan_range",
    "agg_bucket_basic",
    "agg_rate_delta",
    "agg_irate_integral",
    "window_moving_avg",
    "fill_linear",
    "topk_desc",
    "dedup_exact",
    "minhash_lsh_pairs",
    "knn_cosine_brute",
    "ann_lsh_cosine",
    # round 9: simhash_signatures folded into near_dup_scores ('sig' part),
    # aligned_series_ratio + asof_join_latest_before merged into
    # align_asof_ratio — those three rows are NOT comparable to r08 and
    # earlier; funnel_retention and vocab_lm_coverage are new.
    "near_dup_scores",
    "text_stats",
    "storage_roundtrip",
    "rollup_served_engine_query",
    "align_asof_ratio",
    "funnel_retention",
    "vocab_lm_coverage",
]

# FROZEN comparison sets (r9 verdict finding 2). Each is an explicit name
# list pinned at the round that defined it — NEVER recomputed from the
# current HEADLINE, so a catalog rotation can't silently change what a
# subtotal measures. The subtotal is computed over the intersection of the
# frozen list with the queries actually timed this run; if any name is
# missing, the key reports how many of the frozen set were present.
FROZEN_SETS: dict[str, list[str]] = {
    # the 16 queries present in BOTH the r06-r08 19-query headline set and
    # the r9+ 20-query set (r9 rotated out simhash_signatures,
    # aligned_series_ratio, asof_join_latest_before and rotated in
    # near_dup_scores, align_asof_ratio, funnel_retention,
    # vocab_lm_coverage)
    "r08_common_16q": [
        "corpus_curation",
        "doc_chunking",
        "scan_range",
        "agg_bucket_basic",
        "agg_rate_delta",
        "agg_irate_integral",
        "window_moving_avg",
        "fill_linear",
        "topk_desc",
        "dedup_exact",
        "minhash_lsh_pairs",
        "knn_cosine_brute",
        "ann_lsh_cosine",
        "text_stats",
        "storage_roundtrip",
        "rollup_served_engine_query",
    ],
    # the exact r11+ 20-query headline set AT R11 SCOPE (r11 verdict item 3 /
    # r12 re-freeze): same names as r09_set_20q, but two members changed
    # MEANING in r11 — doc_chunking also runs the rotated pack_sequences
    # oracle part, funnel_retention carries the default-on adaptive
    # hot-user guard — so the r09 total stopped measuring drift. This set
    # pins the r11 scope; compare r12+ rounds against THIS subtotal (the
    # r09 key is carried one transition round for continuity, then drops).
    "r11_set_20q": [
        "corpus_curation",
        "doc_chunking",
        "scan_range",
        "agg_bucket_basic",
        "agg_rate_delta",
        "agg_irate_integral",
        "window_moving_avg",
        "fill_linear",
        "topk_desc",
        "dedup_exact",
        "minhash_lsh_pairs",
        "knn_cosine_brute",
        "ann_lsh_cosine",
        "near_dup_scores",
        "text_stats",
        "storage_roundtrip",
        "rollup_served_engine_query",
        "align_asof_ratio",
        "funnel_retention",
        "vocab_lm_coverage",
    ],
    # the exact r9/r10 20-query headline set (r09 SCOPE — two members
    # changed meaning in r11, see r11_set_20q; retained one transition
    # round for cross-round continuity)
    "r09_set_20q": [
        "corpus_curation",
        "doc_chunking",
        "scan_range",
        "agg_bucket_basic",
        "agg_rate_delta",
        "agg_irate_integral",
        "window_moving_avg",
        "fill_linear",
        "topk_desc",
        "dedup_exact",
        "minhash_lsh_pairs",
        "knn_cosine_brute",
        "ann_lsh_cosine",
        "near_dup_scores",
        "text_stats",
        "storage_roundtrip",
        "rollup_served_engine_query",
        "align_asof_ratio",
        "funnel_retention",
        "vocab_lm_coverage",
    ],
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from sydradb_spark.session import get_spark

    spark = get_spark("sydradb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()

    # warm-up: JVM, parquet footer reads, Python worker pool, and the write
    # path (output committer / parquet writer class-init costs ~2s once per
    # JVM — amortized here so storage entries measure the operation, not
    # class loading)
    import shutil
    import tempfile

    from sydradb_spark.storage import write_points
    from sydradb_spark.tables import events_points, load_table

    load_table(spark, sf_dir, "events").count()
    # scale twins may carry a single table (e.g. the sf10/sf100 events-only
    # decades) — skip the documents warm-up there; doc entries can't run on
    # such a twin anyway, so nothing is measured cold
    has_documents = os.path.exists(os.path.join(sf_dir, "documents.parquet"))
    if has_documents:
        load_table(spark, sf_dir, "documents").count()
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        write_points(
            events_points(spark, sf_dir).limit(100), f"{warm_dir}/t", mode="overwrite"
        )
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)
    # the dedup/curation operator tree (md5 hashing, higher-order array
    # functions, explode chains, the union-find probe) JITs ~20-25s of
    # codegen classes on its first execution in a fresh JVM — run it once
    # over a 64-doc subset so the timed runs measure the operators, not
    # one-time class compilation (same rationale as the write warm-up)
    if has_documents:
        from sydradb_spark.pipeline.dedup import curate_corpus

        curate_corpus(load_table(spark, sf_dir, "documents").limit(64)).count()

    # Self-calibration (round 8): a fixed synthetic pure-CPU query — no I/O,
    # no data dependence — whose median time rides the JSON so cross-round
    # totals can be normalized for host drift without re-running old
    # commits (r07 burned a day proving a 15-20% drift that way). 20M-row
    # hash+sqrt aggregate over an in-memory range, 32 splits: long enough
    # (~1s) to dwarf scheduling noise, short enough to be free.
    calib_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(xxhash64(id, id * 31)) as h", "avg(sqrt(id)) as s"
        ).collect()
        calib_runs.append(round(time.perf_counter() - t0, 3))
    calibration = sorted(calib_runs)[1]
    print(f"# calibration: median={calibration:.3f}s runs={calib_runs}", file=sys.stderr)

    # Median-of-3 per query: single-shot timings drifted 1.1-1.2x between
    # rounds with no code change (unfalsifiable noise). Run 1 includes
    # plan compilation + JIT for that query's operators; the median absorbs
    # it without hiding a real regression. Entries that write use fresh
    # scratch dirs per call, so repeats measure the same work. NOT medianed
    # away: cold-cache parquet reads — the warm-up above already pins the
    # OS page cache at this data scale, so medians measure compute, not IO.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    # Outlier rule (round 13, r12 verdict item 2): BENCH_r12 shipped one
    # entry 2.9x off from a single noisy host window and nothing flagged it
    # (corpus_curation 11.35s vs a re-measured 3.998s — host interference
    # adjudicated by the r12 judge). When the max/min spread of an entry's
    # runs exceeds SPREAD_LIMIT, take up to MAX_EXTRA extra runs; the
    # median over ALL runs then outvotes a one-off stall, and the per-entry
    # rerun count rides in both the detail payload and the compact line so
    # a record whose medians needed defending says so.
    SPREAD_LIMIT = 2.0
    MAX_EXTRA = 2

    def timed_runs(run_once) -> tuple[list[float], int]:
        runs = [run_once() for _ in range(repeats)]
        extra = 0
        while (
            len(runs) > 1
            and min(runs) > 0
            and max(runs) / min(runs) > SPREAD_LIMIT
            and extra < MAX_EXTRA
        ):
            runs.append(run_once())
            extra += 1
        return runs, extra

    # Second trigger (same verdict item): an entry whose round-over-round
    # ratio vs the newest recorded BENCH_r*.json exceeds the calibration
    # drift by >1.5x gets the same extra-repeat treatment — a one-entry 2.9x
    # jump on a host running 1.0x calibration is an outlier, not a
    # regression (or a regression worth re-measuring before it ships).
    prev_queries: dict = {}
    prev_cal = None
    try:
        import glob as _glob

        cands = sorted(
            _glob.glob(
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "BENCH_r*.json"
                )
            )
        )
        if cands:
            with open(cands[-1]) as fh:
                pj = json.load(fh)
            # only a same-scale record is comparable (scale campaigns run
            # this script at sf1/sf10/sf100 — a ratio against the driver's
            # sf0.1 record would trigger spurious reruns there)
            if isinstance(pj, dict) and pj.get("sf") == sf_num:
                prev_queries = pj.get("queries") or {}
                prev_cal = pj.get("calibration")
    except (OSError, ValueError):
        pass  # no prior record (fresh clone / driver truncation) — rule inert

    # SPARK_GRAFT_BENCH_QUERIES (round 9): comma-separated subset for scale
    # campaigns (e.g. the sf100 decade runs only the scale-sensitive
    # entries); default is the full headline set the driver records.
    subset = [
        q for q in os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").split(",") if q
    ]
    headline = [q for q in HEADLINE if not subset or q in subset] + [
        q for q in subset if q not in HEADLINE
    ]
    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    outlier_reruns: dict[str, int] = {}  # only entries that triggered the rule
    for name in headline:
        fn = qs[name]
        # rows/cols from ONE untimed count (also warms this entry's plan).
        # Timed runs then materialize through the noop sink: count() lets
        # Catalyst PRUNE every column the query computes — a map-only entry
        # like text_stats was "timed" without evaluating a single stat
        # column (found round 8: its count-time was 0.5s, its real cost
        # 147s before the k-gram fix). The noop write evaluates the full
        # projection JVM-side with no I/O, so numbers measure the operator.
        df = fn(spark, sf_dir)
        rows = df.count()
        cols = len(df.columns)

        def run_once() -> float:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)

        runs, reruns = timed_runs(run_once)
        timings[name] = sorted(runs)[len(runs) // 2]
        prev_t = prev_queries.get(name)
        if prev_cal and prev_t and prev_t > 0:
            allowed = 1.5 * max(calibration / prev_cal, 1.0)
            while timings[name] / prev_t > allowed and reruns < MAX_EXTRA:
                runs.append(run_once())
                reruns += 1
                timings[name] = sorted(runs)[len(runs) // 2]
        if reruns:
            outlier_reruns[name] = reruns
        detail[name] = {
            "median": timings[name],
            "runs": runs,
            "rows": rows,
            "cols": cols,
            "outlier_reruns": reruns,
            "measure": "noop_write",
        }
        print(
            f"# {name}: median={timings[name]:.3f}s runs={runs} rows={rows}"
            + (f" outlier_reruns={reruns}" if reruns else ""),
            file=sys.stderr,
        )

    # MinHash build/query split (round 8): one cold index build, then warm
    # queries probing the materialized parquet index — the number that shows
    # repeated near-dup calls no longer re-pay the tokenize+hash pass (the
    # honest r07 cost of fixing the cache leak). Kept OUT of `queries`/
    # `value` so headline totals stay comparable to r06/r07.
    from sydradb_spark.pipeline.dedup import (
        minhash_query_index,
        minhash_read_index,
        minhash_write_index,
    )

    # subset campaigns (SPARK_GRAFT_BENCH_QUERIES) time only the named
    # entries — the index/storage extras are full-headline instrumentation
    idx_dir = tempfile.mkdtemp(prefix="bench_mh_idx_") if not subset else ""
    index_split: dict = {}
    try:
        if not subset:
            docs = load_table(spark, sf_dir, "documents")
            t0 = time.perf_counter()
            minhash_write_index(docs, f"{idx_dir}/mh")
            index_split["minhash_index_build"] = round(time.perf_counter() - t0, 3)
            sh_i, bands_i = minhash_read_index(spark, f"{idx_dir}/mh")
            q_runs = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                minhash_query_index(sh_i, bands_i, threshold=0.2).count()
                q_runs.append(round(time.perf_counter() - t0, 3))
            index_split["minhash_query_warm"] = sorted(q_runs)[len(q_runs) // 2]
            index_split["minhash_query_runs"] = q_runs
            index_split["minhash_cold_fused"] = timings.get("minhash_lsh_pairs")
            print(f"# minhash index split: {index_split}", file=sys.stderr)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # Winnow build/query split (round 10, r9 verdict item 4): same pattern —
    # one cold fingerprint-partitioned index build, then warm containment
    # queries for a deterministic ~0.1% probe sample, each reading only the
    # probes' fingerprint partitions.
    from pyspark.sql import functions as F

    from sydradb_spark.pipeline import text as _text

    wn_dir = tempfile.mkdtemp(prefix="bench_wn_idx_") if not subset else ""
    try:
        if not subset:
            docs = load_table(spark, sf_dir, "documents")
            t0 = time.perf_counter()
            _text.winnow_write_index(docs, f"{wn_dir}/wn")
            index_split["winnow_index_build"] = round(time.perf_counter() - t0, 3)
            wn_idx = _text.winnow_read_index(spark, f"{wn_dir}/wn")
            probes = docs.where(F.pmod(F.col("doc_id"), F.lit(997)) == 0)
            q_runs = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                _text.winnow_query_index(wn_idx, probes, min_shared=2).count()
                q_runs.append(round(time.perf_counter() - t0, 3))
            index_split["winnow_query_warm"] = sorted(q_runs)[len(q_runs) // 2]
            index_split["winnow_query_runs"] = q_runs
            print(f"# winnow index split: {index_split}", file=sys.stderr)
    finally:
        shutil.rmtree(wn_dir, ignore_errors=True)

    # Storage-mode path (round 9, r8 verdict item 6): the headline queries
    # read raw single parquet files; this block writes the same events to
    # the engine's own hour-partitioned storage layout (write_points +
    # manifest) and re-runs the range scan + bucket agg through the
    # engine's storage scan, so partition pruning shows up in a recorded
    # number — including whether the executed plan actually pruned
    # (PartitionFilters on hour_bucket). Kept OUT of headline totals
    # (same policy as index_split).
    from sydradb_spark.contract.base import D3, T0
    from sydradb_spark.sydraql.engine import SydraQLEngine

    st_dir = tempfile.mkdtemp(prefix="bench_storage_") if not subset else ""
    storage_mode: dict = {}
    try:
        if not subset:
            t0 = time.perf_counter()
            write_points(events_points(spark, sf_dir), f"{st_dir}/t", mode="overwrite")
            storage_mode["storage_write"] = round(time.perf_counter() - t0, 3)
            eng = SydraQLEngine(spark, storage_path=f"{st_dir}/t")
            st_queries = {
                "storage_scan_range": (
                    f"select time, value from events.click "
                    f"where time >= {T0} and time < {D3}"
                ),
                "storage_agg_bucket": (
                    f"select time_bucket(3600, time) as b, avg(value) as v, "
                    f"count() as n from events.click "
                    f"where time >= {T0} and time < {D3} "
                    f"group by time_bucket(3600, time)"
                ),
            }
            for name, q in st_queries.items():
                df0 = eng.query(q).df
                plan = df0._jdf.queryExecution().executedPlan().toString()
                pf = (
                    plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
                    if "PartitionFilters" in plan
                    else ""
                )
                st_runs = []
                for _ in range(repeats):
                    t0 = time.perf_counter()
                    eng.query(q).df.write.format("noop").mode("overwrite").save()
                    st_runs.append(round(time.perf_counter() - t0, 3))
                storage_mode[name] = sorted(st_runs)[len(st_runs) // 2]
                storage_mode[f"{name}_runs"] = st_runs
                storage_mode[f"{name}_partition_pruned"] = "hour_bucket" in pf
            print(f"# storage mode: {storage_mode}", file=sys.stderr)
    finally:
        shutil.rmtree(st_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # Calibration-normalized seconds (round 16, r15 verdict item 1 —
    # ADDITIONS ONLY, nothing existing renamed or removed): the r15 record
    # landed in a host window whose data-independent CPU probe ran 7.6x
    # slower than r14's, making raw cross-round totals unreadable. The
    # normalized values scale every number by (CAL_REF / this run's
    # calibration), i.e. express the run as-if on the r14 reference host
    # speed (calibration 0.171, the anchor the r15 verdict normalized to).
    # Raw values stay authoritative within one record; the normalized ones
    # exist so cross-round comparisons survive host drift without
    # forensics. Normalization is linear in the CPU probe and therefore
    # approximate for entries dominated by the per-job scheduling floor.
    CAL_REF = 0.171
    norm = CAL_REF / calibration if calibration > 0 else 1.0
    total_normalized = round(total * norm, 3)
    queries_normalized = {q: round(t * norm, 3) for q, t in timings.items()}
    # like-for-like subtotals over FROZEN name lists (see FROZEN_SETS):
    # each key sums only the frozen set's queries actually timed this run,
    # and "<key>_n" records how many of the frozen set were present so a
    # partial subset run can't masquerade as a full-set total.
    comparable: dict = {}
    for key, names in FROZEN_SETS.items():
        present = [q for q in names if q in timings]
        comparable[key] = round(sum(timings[q] for q in present), 3)
        if len(present) != len(names):
            comparable[f"{key}_n"] = f"{len(present)}/{len(names)}"

    # Compact line on stdout — the driver keeps only a ~2000-char tail, so
    # everything bulky rides in the detail payload below instead.
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        "repeats": repeats,
        "calibration": calibration,
        "calibration_ref": CAL_REF,
        "value_normalized": total_normalized,
        "queries_normalized": queries_normalized,
        "comparable_to_prev": comparable,
        # the outlier rule's trigger map (empty = no median needed defending);
        # visible in the driver's record per r12 verdict item 2
        "outlier_reruns": outlier_reruns,
    }
    full = dict(
        compact,
        calibration_runs=calib_runs,
        index_split=index_split,
        storage_mode=storage_mode,
        detail=detail,
        note=(
            "totals comparable only within the named frozen set AND "
            "measure; r08 switched timing from count() to a noop-sink "
            "write because count() let Catalyst prune the computed "
            "columns of map-only entries — normalize cross-round totals "
            "by `calibration` for host drift"
        ),
    )
    print(f"# detail: {json.dumps(full)}", file=sys.stderr)
    try:
        os.makedirs(".scratch", exist_ok=True)
        with open(".scratch/bench_detail.json", "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass
    line = json.dumps(compact)
    # hard guard: the driver's tail window is ~2000 chars — if the compact
    # line ever outgrows it, drop optional keys rather than ship a line the
    # driver records as parsed:null (this is exactly what happened r08-r09)
    if len(line) > 1900:
        # drop optional keys in reverse value order; the raw `queries` map
        # and `calibration` are the driver's record and are never dropped
        compact.pop("queries_normalized", None)
        line = json.dumps(compact)
    if len(line) > 1900:
        compact.pop("comparable_to_prev", None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
