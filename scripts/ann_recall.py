"""ANN recall at the 1M-vector twin (round 12, r11 verdict item 6).

`test_ann_lsh_recall` / `test_ann_ivf_recall` pin recall at toy corpora;
recall is the one ANN property that silently degrades with scale and
geometry. This script measures recall@k for both ANN paths against the
exact `knn_brute_arrow` oracle (~1-2 s at 1M x 64 — cheap enough to be
ground truth) at the 1M scale, on TWO geometries, because the recall/scan
tradeoff is geometry-dependent and a single fabricated blob answers
nothing:

- **separated** (centers at 5 sigma, queries drawn from the clusters):
  the driver's embeddings shape — labeled clusters, neighbours share the
  query's cluster. Both ANN paths should be near-exact here.
- **overlapped** (centers at 1.5 sigma, queries at center-pair midpoints):
  the hard regime — cosine neighbours are noise-dominated and split across
  coarse cells. IVF recall is bought with n_probe; sign-LSH (which needs
  directional cluster structure) degrades toward chance, and MEASURING
  that is the point — it documents where the LSH path stops being
  applicable instead of letting it silently return garbage at scale.

Sweeps: sign-LSH bits x multi_probe; IVF n_probe over a 64-centroid
coarse quantizer. Prints ONE JSON line (recorded in SCALE_NOTES) and
FAILS (exit 1) if a pinned floor breaks — floors are set a few points
under the 1M measurement to catch regressions, not to flatter the curve.

Usage: python scripts/ann_recall.py [--n 1000000] [--queries 32] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from sydradb_spark.pipeline import similarity as sim  # noqa: E402
from sydradb_spark.session import get_spark  # noqa: E402

SEED = 1234
N_CLUSTERS = 64
DIM = 64

GEOMETRIES = {
    "separated": {"center_scale": 5.0, "queries": "cluster"},
    "overlapped": {"center_scale": 1.5, "queries": "midpoint"},
}

# floors a few points under the 1M measurement (ANN_RECALL_r12.json /
# SCALE_NOTES r12: separated ivf@1=1.0, lsh8mp=0.97, lsh12mp=0.83;
# overlapped ivf@1=0.82, ivf@2..16=1.0)
FLOORS = [
    ("separated", "ivf", {"n_probe": 1}, 0.95),
    ("separated", "lsh", {"bits": 8, "multi_probe": True}, 0.90),
    ("separated", "lsh", {"bits": 12, "multi_probe": True}, 0.70),
    ("overlapped", "ivf", {"n_probe": 1}, 0.70),
    ("overlapped", "ivf", {"n_probe": 4}, 0.95),
]


def _centers(scale: float) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return rng.normal(0.0, scale, size=(N_CLUSTERS, DIM))


def gen_corpus(spark, n: int, scale: float):
    """(vec_id, embedding) — id i belongs to cluster i % N_CLUSTERS with
    unit Gaussian noise; per-batch rng seeded by the batch's first id so
    the corpus is deterministic under any partitioning of a sorted range."""
    centers = _centers(scale)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(SEED + int(ids[0]))
            noise = rng.normal(0.0, 1.0, size=(len(ids), DIM))
            vecs = centers[ids % N_CLUSTERS] + noise
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [row.tolist() for row in vecs]}
            )

    return spark.range(n, numPartitions=32).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def gen_queries(spark, n_corpus: int, n_q: int, scale: float, mode: str):
    qrng = np.random.default_rng(SEED + 999)
    centers = _centers(scale)
    qvecs = []
    for i in range(n_q):
        if mode == "cluster":
            base = centers[i % N_CLUSTERS]
        else:  # midpoint: neighbours split across >= 2 coarse cells
            a, b = i % N_CLUSTERS, (i * 7 + 3) % N_CLUSTERS
            base = (centers[a] + centers[b]) / 2.0
        qvecs.append((base + qrng.normal(0.0, 1.0, DIM)).tolist())
    return spark.createDataFrame(
        [(n_corpus + i, v) for i, v in enumerate(qvecs)],
        "vec_id long, embedding array<double>",
    )


def recall_at_k(got_df, truth: dict) -> float:
    got: dict = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    return sum(
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)


def sweep_geometry(spark, name: str, cfg: dict, args) -> dict:
    corpus = gen_corpus(spark, args.n, cfg["center_scale"]).persist()
    n = corpus.count()
    queries = gen_queries(
        spark, args.n, args.queries, cfg["center_scale"], cfg["queries"]
    ).persist()
    queries.count()

    t0 = time.perf_counter()
    truth: dict = {}
    for r in sim.knn_brute_arrow(queries, corpus, args.k).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    t_exact = round(time.perf_counter() - t0, 2)

    out: dict = {"geometry": name, "exact_oracle_s": t_exact, "lsh": [], "ivf": []}

    for bits in (8, 12, 16):
        planes = sim.hyperplanes(DIM, bits, seed=42)
        index = sim.sign_index(corpus, planes=planes).persist()
        index.count()
        for multi in (False, True):
            t0 = time.perf_counter()
            got = sim.ann_sign_lsh_indexed(
                queries, index, args.k, planes=planes, multi_probe=multi
            )
            rec = recall_at_k(got, truth)
            dt = round(time.perf_counter() - t0, 2)
            qb = sim.sign_bucket(F.col("embedding"), planes)
            probes = [qb] + (
                [qb.bitwiseXOR(F.lit(1 << b)) for b in range(bits)] if multi else []
            )
            q = queries.select(
                F.col("vec_id").alias("query_id"),
                F.explode(F.array(*probes)).alias("bucket"),
            )
            cand = index.join(F.broadcast(q), on="bucket").count()
            row = {
                "bits": bits,
                "multi_probe": multi,
                "recall_at_k": round(rec, 4),
                "scan_fraction": round(cand / (args.queries * n), 5),
                "s": dt,
            }
            out["lsh"].append(row)
            print(f"# {name} lsh: {row}", file=sys.stderr)
        index.unpersist()

    sample = [r["embedding"] for r in corpus.limit(10_000).collect()]
    centroids = sim.kmeans_fit_sample(sample, N_CLUSTERS, n_iters=8)
    ivf_index = corpus.select(
        "vec_id",
        F.col("embedding").alias("__ce"),
        sim.assign_cluster(F.col("embedding"), centroids).alias("cluster"),
    ).persist()
    sizes = {
        r["cluster"]: r["n"]
        for r in ivf_index.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.perf_counter()
        got = sim.ann_ivf_indexed(queries, ivf_index, centroids, args.k, n_probe)
        rec = recall_at_k(got, truth)
        dt = round(time.perf_counter() - t0, 2)
        w = Window.partitionBy("query_id").orderBy(
            F.col("__d2").asc(), F.col("cluster").asc()
        )
        probed = (
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.posexplode(
                    sim.centroid_d2s(F.col("embedding"), centroids)
                ).alias("cluster", "__d2"),
            )
            .withColumn("__pr", F.row_number().over(w))
            .where(F.col("__pr") <= n_probe)
            .collect()
        )
        cand = sum(sizes.get(r["cluster"], 0) for r in probed)
        row = {
            "n_probe": n_probe,
            "recall_at_k": round(rec, 4),
            "scan_fraction": round(cand / (args.queries * n), 5),
            "s": dt,
        }
        out["ivf"].append(row)
        print(f"# {name} ivf: {row}", file=sys.stderr)
    ivf_index.unpersist()
    corpus.unpersist()
    queries.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    results = {
        name: sweep_geometry(spark, name, cfg, args)
        for name, cfg in GEOMETRIES.items()
    }

    floors = []
    for geo, path, match, want in FLOORS:
        rows = results[geo][path]
        got = next(
            (
                r["recall_at_k"]
                for r in rows
                if all(r[k] == v for k, v in match.items())
            ),
            0.0,
        )
        floors.append(
            {
                "check": f"{geo}/{path}/{match}",
                "got": got,
                "floor": want,
                "ok": got >= want,
            }
        )

    print(
        json.dumps(
            {
                "n": args.n,
                "queries": args.queries,
                "k": args.k,
                "geometries": results,
                "floors": floors,
                "all_floors_ok": all(f["ok"] for f in floors),
            }
        )
    )
    if not all(f["ok"] for f in floors):
        sys.exit(1)


if __name__ == "__main__":
    main()
