"""Similarity search over an embeddings table ``(vec_id long, embedding
array<float>, ...)``.

Two paths, same output shape (query_id, vec_id, cosine):

- ``knn_brute``: exact top-k. Broadcast the (small) query set against the
  corpus — a map-side join, no shuffle of the corpus — then a per-query top-k
  window. The dot product is `zip_with` + `aggregate` higher-order functions:
  all-JVM, no Python. This is the baseline and the verifier.
- ``ann_sign_lsh``: the scale path. A sign-bit LSH bucket (one byte from the
  signs of the first 8 dimensions here; real deployments use random
  hyperplanes and more bits) partitions the corpus; queries probe only their
  bucket, cutting the scanned corpus by ~2^bits at some recall cost. The
  bucket id is deterministic arithmetic so a DuckDB oracle reproduces it.

At 100 TB the corpus side stays partitioned/bucketed by ``bucket`` on disk so
a probe prunes partitions instead of scanning; the brute path shards the
query set when it outgrows a broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_DIMS = 8  # sign bits taken from dimensions 1..8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields null (ranked last), not an
    # ANSI-mode DIVIDE_BY_ZERO error on the driver's default session
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def knn_brute(
    queries: DataFrame, corpus: DataFrame, k: int, emb_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` per row of ``queries``. Both frames
    need (vec_id, embedding); queries is broadcast."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col(emb_col).alias("__qe")
    )
    c = corpus.select("vec_id", F.col(emb_col).alias("__ce"))
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine(F.col("__qe"), F.col("__ce")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def sign_bucket(emb: Column, dims: int = LSH_DIMS) -> Column:
    """Deterministic sign-LSH bucket: bit d set iff embedding[d+1] > 0."""
    bucket = F.lit(0)
    for d in range(dims):
        bucket = bucket + F.when(F.element_at(emb, d + 1) > 0, F.lit(1 << d)).otherwise(
            F.lit(0)
        )
    return bucket.cast("long")


def ivf_index(
    corpus: DataFrame, k: int = 16, emb_col: str = "embedding", seed: int = 42
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: KMeans over the corpus; returns the corpus with
    a ``cluster`` column plus the centroid list.

    At scale the assigned corpus is written bucketed/partitioned BY cluster,
    so a probe reads only n_probe/k of the data — the IVF analogue of the
    hour-bucket layout the time-series side uses. Training samples the corpus
    (KMeans over 100 TB is itself distributed, or fit on a sample)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vec = corpus.withColumn(
        "__v", array_to_vector(F.col(emb_col).cast("array<double>"))
    )
    model = KMeans(k=k, seed=seed, featuresCol="__v", predictionCol="cluster").fit(vec)
    assigned = model.transform(vec).drop("__v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ann_ivf(
    queries: DataFrame,
    corpus_assigned: DataFrame,
    centroids: list[list[float]],
    k: int,
    n_probe: int = 2,
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF probe: each query scans only its ``n_probe`` nearest centroids'
    inverted lists. Probe selection is a broadcast join against the (tiny)
    centroid table; candidate scan is a join on ``cluster`` — partition-
    pruned when the corpus is stored bucketed by cluster."""
    spark = queries.sparkSession
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cluster int, centroid array<double>"
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col(emb_col).alias("__qe")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("__qe"), F.col("centroid"), lambda x, y: (x.cast("double") - y) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.col("__d2").asc(), F.col("cluster").asc())
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("__d2", d2)
        .withColumn("__pr", F.row_number().over(w_probe))
        .where(F.col("__pr") <= n_probe)
        .select("query_id", "__qe", "cluster")
    )
    c = corpus_assigned.select(
        "vec_id", F.col(emb_col).alias("__ce"), "cluster"
    )
    scored = c.join(F.broadcast(probes), on="cluster").select(
        "query_id", "vec_id", cosine(F.col("__qe"), F.col("__ce")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ann_sign_lsh(
    queries: DataFrame, corpus: DataFrame, k: int, emb_col: str = "embedding"
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign-LSH bucket."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col(emb_col).alias("__qe"),
        sign_bucket(F.col(emb_col)).alias("bucket"),
    )
    c = corpus.select(
        "vec_id", F.col(emb_col).alias("__ce"), sign_bucket(F.col(emb_col)).alias("bucket")
    )
    scored = c.join(F.broadcast(q), on="bucket").select(
        "query_id", "vec_id", cosine(F.col("__qe"), F.col("__ce")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
