"""Round-15 optimization profiler.

Two modes:

  python scripts/profile_r15.py plans [suffix]
      Capture ``df.explain("formatted")`` for every headline query into
      plans/r15/<name>_<suffix>.txt (default suffix: before). No execution
      beyond what building the DataFrame needs (some entries write scratch
      tables / probe a row at build time).

  python scripts/profile_r15.py parts [entry ...]
      Time the labeled sub-parts of the compound entries (and the stages of
      the heavy single ones) through the noop sink, 3 reps each, so the
      per-entry medians say WHERE the seconds go before anything is changed
      (guide §1: measure first, isolate with noop).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

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


def _spark():
    from sydradb_spark.session import get_spark

    spark = get_spark("sydradb-profile-r15")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _timed(spark, label: str, build):
    """Median-of-REPEATS noop-sink time for the frame ``build()`` returns."""
    runs = []
    for _ in range(REPEATS):
        spark.sparkContext.setJobDescription(label)
        runs.append(_noop(build()))
    spark.sparkContext.setJobDescription(None)
    med = sorted(runs)[len(runs) // 2]
    print(f"  {label}: median={med:.3f}s runs={runs}", flush=True)
    return med


def capture_plans(suffix: str = "before") -> None:
    spark = _spark()
    import __spark_entry__ as entry

    qs = entry.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        print(f"{name}: {len(plan)}B exchanges~{n_ex} python_nodes~{n_py} -> {path}", flush=True)


def profile_parts(only: list[str]) -> None:
    from pyspark.sql import functions as F

    from sydradb_spark.contract.base import T0, T1, D3
    from sydradb_spark.pipeline import dedup, events as ev_ops, similarity, text
    from sydradb_spark.tables import events_points, load_table

    spark = _spark()
    sel = set(only) if only else None

    def want(name: str) -> bool:
        return sel is None or name in sel

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    ev = load_table(spark, SF_DIR, "events")

    # warm-up (JIT, page cache) — same rationale as bench.py
    docs.count(); emb.count(); ev.count()
    from sydradb_spark.pipeline.dedup import curate_corpus
    curate_corpus(docs.limit(64)).count()

    if want("near_dup_scores"):
        print("near_dup_scores parts:", flush=True)
        from sydradb_spark.contract.pipeline import (
            _embed_dedup, _ngram_topk, _simhash_pairs,
        )
        _timed(spark, "nds:ngram_topk", lambda: _ngram_topk(spark, SF_DIR))
        _timed(spark, "nds:embed_dedup", lambda: _embed_dedup(spark, SF_DIR))
        _timed(spark, "nds:simhash_pairs", lambda: _simhash_pairs(spark, SF_DIR))
        _timed(spark, "nds:sig", lambda: dedup.simhash(load_table(spark, SF_DIR, "documents")))

    if want("minhash_lsh_pairs"):
        print("minhash_lsh_pairs stages:", flush=True)
        _timed(spark, "mh:shingle_table", lambda: dedup.shingle_table(load_table(spark, SF_DIR, "documents")))
        _timed(spark, "mh:signatures", lambda: dedup.minhash_signatures(dedup.shingle_table(load_table(spark, SF_DIR, "documents"))))
        _timed(spark, "mh:bands", lambda: dedup.minhash_band_signatures(dedup.shingle_table(load_table(spark, SF_DIR, "documents"))))
        _timed(spark, "mh:shingle_arrays", lambda: dedup.shingle_arrays(load_table(spark, SF_DIR, "documents")))
        _timed(spark, "mh:full", lambda: dedup.minhash_near_dups(load_table(spark, SF_DIR, "documents"), 0.2))

    if want("corpus_curation"):
        print("corpus_curation stages:", flush=True)
        from sydradb_spark.contract.pipeline import _CURATE_Q, _CURATE_J
        from sydradb_spark.pipeline.text import quality_score_arrow

        def gate():
            d = load_table(spark, SF_DIR, "documents")
            return d.withColumn("quality", quality_score_arrow(F.col("text"))).where(
                F.col("quality") >= _CURATE_Q
            )

        _timed(spark, "cc:quality_gate", gate)
        _timed(spark, "cc:exact_dedup", lambda: dedup.exact_dedup(gate()))
        _timed(
            spark,
            "cc:near_dups",
            lambda: dedup.minhash_near_dups(dedup.exact_dedup(gate()), _CURATE_J),
        )
        _timed(
            spark,
            "cc:full",
            lambda: dedup.curate_corpus(load_table(spark, SF_DIR, "documents"), min_quality=_CURATE_Q, near_dup_threshold=_CURATE_J),
        )

    if want("ann_lsh_cosine"):
        print("ann_lsh_cosine stages:", flush=True)
        _timed(
            spark,
            "ann:corpus_buckets",
            lambda: load_table(spark, SF_DIR, "embeddings").select(
                "vec_id", similarity.sign_bucket(F.col("embedding")).alias("b")
            ),
        )
        _timed(
            spark,
            "ann:full",
            lambda: similarity.ann_sign_lsh(
                load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 5),
                load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") >= 5),
                k=3,
            ),
        )

    if want("vocab_lm_coverage"):
        print("vocab_lm_coverage parts:", flush=True)
        _timed(spark, "vlc:vocab_topk", lambda: text.vocab_topk(load_table(spark, SF_DIR, "documents"), n=200))
        _timed(
            spark,
            "vlc:coverage",
            lambda: text.token_coverage(
                load_table(spark, SF_DIR, "documents"),
                text.vocab_topk(load_table(spark, SF_DIR, "documents"), n=200).select("token"),
            ),
        )
        _timed(
            spark,
            "vlc:lm",
            lambda: text.lm_score_docs(
                load_table(spark, SF_DIR, "documents"),
                text.train_bigram_lm(load_table(spark, SF_DIR, "documents")),
            ),
        )

    if want("funnel_retention"):
        print("funnel_retention parts:", flush=True)
        from sydradb_spark.contract.pipeline import _FUNNEL_STEPS, _FUNNEL_WITHIN, _RET_BUCKET

        _timed(
            spark,
            "fr:stages",
            lambda: ev_ops.funnel_stages(load_table(spark, SF_DIR, "events"), _FUNNEL_STEPS, _FUNNEL_WITHIN),
        )
        _timed(
            spark,
            "fr:retention",
            lambda: ev_ops.retention_cohorts(load_table(spark, SF_DIR, "events"), bucket_seconds=_RET_BUCKET),
        )

    if want("storage_roundtrip"):
        print("storage_roundtrip stages:", flush=True)
        import shutil
        import tempfile

        from sydradb_spark import storage

        def write_only():
            d = tempfile.mkdtemp(prefix="prof_sr_")
            pts = events_points(spark, SF_DIR).where(F.col("ts") < T0 + 7 * 86400)
            t0 = time.perf_counter()
            storage.write_points(pts, f"{d}/t", mode="overwrite")
            dt = round(time.perf_counter() - t0, 3)
            shutil.rmtree(d, ignore_errors=True)
            return dt

        runs = [write_only() for _ in range(REPEATS)]
        print(f"  sr:write_points: median={sorted(runs)[len(runs)//2]:.3f}s runs={runs}", flush=True)

    if want("agg_irate_integral"):
        print("agg_irate_integral stages:", flush=True)
        from sydradb_spark.contract.core import QUERIES as _CQ  # noqa
        import __spark_entry__ as entry

        qs = entry.queries()
        _timed(spark, "aii:full", lambda: qs["agg_irate_integral"](spark, SF_DIR))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if mode == "plans":
        capture_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif mode == "parts":
        profile_parts(sys.argv[2:])
    else:
        raise SystemExit(f"unknown mode {mode!r}")
