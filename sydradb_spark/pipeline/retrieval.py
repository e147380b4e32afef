"""BM25 full-text retrieval over a documents table — the keyword-search
half of a training-data engine (find contaminated docs, pull topical
subsets, spot-check dedup candidates by query).

Scale design:
- ``bm25_index`` materializes the classic postings layout ONCE: a
  (term, doc_id, tf) table plus per-doc lengths — one tokenize pass, one
  combining shuffle on (doc_id, term), then one on term when the postings
  are written partitioned/bucketed by term. At 100 TB the index is written
  to parquet partitioned by a term-hash prefix, and every query below
  reads only its query-terms' buckets (partition pruning does the
  inverted-index seek; no index server needed).
- ``bm25_search`` is query-term-bounded end to end: the postings scan is
  filtered with an ``isin`` literal over the (tiny) tokenized query —
  pushed to the parquet scan — the df/idf side is ≤ |query| rows collected
  once, and the final ranking is a TakeOrdered top-k, never a full sort.
- Scoring is Lucene-classic BM25 (k1=1.2, b=0.75,
  idf = ln(1 + (N - df + 0.5)/(df + 0.5))), all pure column arithmetic.

Tokenization is the pipeline's standard lowercase-whitespace split (same
shape the text-stats oracles mirror) so a DuckDB twin reproduces scores
bit-for-bit; swap a real analyzer in at ``_terms`` if needed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def _terms(text: Column) -> Column:
    """Lowercased whitespace terms; empty text → empty array."""
    t = F.lower(F.trim(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def bm25_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, dl) postings with per-doc length attached —
    self-contained for scoring (dl rides each posting, so search needs no
    doc-table join). One explode + one combining groupBy.

    The token array is materialized in its own projection BEFORE the
    explode: placing ``size(_terms(text))`` beside the generator makes
    Spark evaluate the regex split once per OUTPUT token (O(tokens x
    doc_length) per doc — measured 405 s for a 500k-doc index build;
    8.4 s built this way)."""
    base = docs.select("doc_id", _terms(F.col(text_col)).alias("__tk"))
    with_dl = base.select("doc_id", "__tk", F.size("__tk").alias("dl"))
    toks = with_dl.select("doc_id", "dl", F.explode("__tk").alias("term"))
    return toks.groupBy("term", "doc_id", "dl").agg(F.count("*").alias("tf"))


def bm25_corpus_stats(index: DataFrame) -> tuple[int, float]:
    """(N docs, average doc length) from a postings frame — one aggregate.

    N counts documents WITH at least one term (token-less docs have no
    postings), matching Lucene's per-field docCount convention for the
    idf numerator rather than raw corpus size."""
    row = index.select("doc_id", "dl").distinct().agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    assert row is not None
    return int(row["n"]), float(row["avgdl"] or 0.0)


def bm25_search(
    index: DataFrame,
    query: str,
    k: int = 10,
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Top-``k`` (doc_id, score) for ``query`` against a ``bm25_index``
    frame. Pass ``n_docs``/``avgdl`` (from ``bm25_corpus_stats``, computed
    once per index) to skip the stats aggregate per query.

    Every step is query-term-bounded: the postings filter is an ``isin``
    literal (pushed to the scan of a term-partitioned index), df comes
    from ≤ |query| aggregate rows, idf is folded into literals driver-side
    (exact ln), and the ranking is TakeOrdered — no full sort, no join
    wider than the candidate doc set.
    """
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        return index.sparkSession.createDataFrame([], "doc_id long, score double")
    if n_docs is None or avgdl is None:
        n_docs, avgdl = bm25_corpus_stats(index)
    hits = index.where(F.col("term").isin(q_terms))
    dfreq = {
        r["term"]: r["df"]
        for r in hits.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    }
    idf = {
        t: math.log(1.0 + (n_docs - dfreq.get(t, 0) + 0.5) / (dfreq.get(t, 0) + 0.5))
        for t in q_terms
    }
    idf_col = F.element_at(
        F.create_map(
            *[x for t in q_terms for x in (F.lit(t), F.lit(idf[t]))]
        ),
        F.col("term"),
    )
    tf = F.col("tf").cast("double")
    denom = tf + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.lit(float(avgdl or 1.0))
    )
    contrib = idf_col * tf * (BM25_K1 + 1.0) / denom
    return (
        hits.select("doc_id", contrib.alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
