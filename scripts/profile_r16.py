"""Round-16 optimization profiler.

Modes:

  python scripts/profile_r16.py plans [suffix]
      Capture ``df.explain("formatted")`` for every headline query into
      plans/r16/<name>_<suffix>.txt (default suffix: before).

  python scripts/profile_r16.py counts [suffix]
      Execute every headline query ONCE through the noop sink under a
      per-entry job group and record the EXECUTED job/stage counts
      (statusTracker) into plans/r16/executed_counts_<suffix>.json —
      the r15 verdict's evidence upgrade: checkpoint-truncated static
      plans can overstate dedup wins, executed stage counts cannot.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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
    "near_dup_scores",
    "text_stats",
    "storage_roundtrip",
    "rollup_served_engine_query",
    "align_asof_ratio",
    "funnel_retention",
    "vocab_lm_coverage",
]
# non-bench oracle entries whose code the optimization rounds touch — the
# chunked-window helpers and the clustering chain reach these
EXTRA = ["window_lag_lead_ff", "window_ema", "sessionize_gap", "dedup_clusters"]


def _spark():
    from sydradb_spark.session import get_spark

    spark = get_spark("sydradb-profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _out_dir() -> str:
    d = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(d, exist_ok=True)
    return d


def capture_plans(suffix: str = "before") -> None:
    spark = _spark()
    import __spark_entry__ as entry

    qs = entry.queries()
    out_dir = _out_dir()
    for name in HEADLINE + EXTRA:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_py = (
            plan.count("EvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        print(
            f"{name}: {len(plan)}B exchanges~{n_ex} python_nodes~{n_py} -> {path}",
            flush=True,
        )


def capture_counts(suffix: str = "before") -> None:
    """Executed job/stage/task counts per entry: one noop-sink execution under
    a dedicated job group; the status tracker then reports what actually RAN
    (lazy localCheckpoints materialize inside the measured action, so deduped
    subtrees show up here as fewer stages — or don't, if the dedup is fake)."""
    spark = _spark()
    import __spark_entry__ as entry

    qs = entry.queries()
    # warm-up: JIT + page cache + the entry's own scratch-table bootstrap so
    # the counted run measures the steady-state shape (first runs add
    # warm-up-only jobs like parquet schema probes)
    from sydradb_spark.tables import load_table

    load_table(spark, SF_DIR, "events").count()
    if os.path.exists(os.path.join(SF_DIR, "documents.parquet")):
        load_table(spark, SF_DIR, "documents").count()

    tracker = spark.sparkContext.statusTracker()
    out: dict[str, dict] = {}
    for name in HEADLINE + EXTRA:
        fn = qs[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        group = f"r16count:{name}:{suffix}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        stages: set[int] = set()
        n_tasks = 0
        n_done = 0
        n_run_stages = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                if s in stages:
                    continue
                stages.add(s)
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_tasks += si.numTasks
                    # a job DAG lists SKIPPED stages too (cached/persisted
                    # upstream, reused shuffle output) — those run 0 tasks.
                    # Lazy checkpoints make consumers CARRY the upstream DAG
                    # as skipped stages where an eager checkpoint hid it in a
                    # dedicated job, so raw `stages`/`tasks` overstate lazy
                    # shapes; `stages_executed`/`tasks_completed` count what
                    # actually ran (r16 addition, keys-only — the r15-verdict
                    # evidence upgrade taken one step further).
                    done = si.numCompletedTasks
                    n_done += done
                    if done > 0:
                        n_run_stages += 1
        out[name] = {
            "jobs": len(job_ids),
            "stages": len(stages),
            "stages_executed": n_run_stages,
            "tasks": n_tasks,
            "tasks_completed": n_done,
            "wall_s": wall,
        }
        print(f"{name}: {out[name]}", flush=True)
    path = os.path.join(_out_dir(), f"executed_counts_{suffix}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"-> {path}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    if mode == "plans":
        capture_plans(suffix)
    elif mode == "counts":
        capture_counts(suffix)
    else:
        raise SystemExit(f"unknown mode {mode!r} (plans|counts)")
