"""Text-analysis operators for a training-data pipeline, over a documents
table ``(doc_id long, text string, ...)``.

Everything here is built-in JVM expressions (split / transform / filter /
aggregate higher-order functions) — no Python UDFs — so the whole stage stays
inside whole-stage codegen and scales linearly with input splits: these are
per-row maps with zero shuffles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Order matters: ties resolve in LANGS order.
LANGS = ("en", "de", "fr", "es")
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "un", "una", "para"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (split('') yields
    [''] which would count as one token)."""
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(text), r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND on transitions
    letters/digits/punct (a cheap stand-in for a BPE tokenizer's granularity;
    a real tokenizer would be a pandas UDF)."""
    pieces = F.split(F.trim(text), r"\s+|(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])")
    return F.size(F.filter(pieces, lambda p: F.length(p) > 0))


def stopword_hits(text: Column, lang: str, toks: Column | None = None) -> Column:
    words = STOPWORDS[lang]
    toks = tokens(text) if toks is None else toks
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(*words)))


def guess_lang(text: Column, toks: Column | None = None) -> Column:
    """Arg-max of per-language stopword hits; ties resolve in LANGS order
    (first CASE branch wins); zero hits everywhere → 'und' (undetermined).

    Pass ``toks`` (a materialized token-array column) to avoid
    re-evaluating ``split`` once per language — see the tokenize-once note
    on ``quality_columns``."""
    scores = {lang: stopword_hits(text, lang, toks) for lang in LANGS}
    mx = F.greatest(*scores.values())
    best = None
    for lang in LANGS:
        cond = (scores[lang] > 0) & (scores[lang] == mx)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise("und")


def quality_columns(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Quality-scoring signals: length, token stats, distinct-token ratio,
    punctuation/space ratios, mean word length.

    Tokenize-once (round 10): without ``toks`` each signal embeds its own
    copy of the ``split`` subtree — Catalyst does NOT common-subexpression-
    eliminate across projection items (and CollapseProject refuses to
    inline expensive aliases, which is exactly what makes the fix work):
    callers that compute several signal groups should materialize
    ``tokens(text)`` as a column in a parent projection and pass it here,
    so the regex split runs once per row instead of once per signal. At
    5M docs the duplicated splits were the dominant allocation source
    (sf100 GC term, r9 verdict item 5)."""
    toks = tokens(text) if toks is None else toks
    n_tok = F.size(toks)
    n_chars = F.length(text)
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0.0), lambda acc, t: acc + F.length(t)) / n_tok,
    ).otherwise(F.lit(0.0))
    space_ratio = F.when(
        n_chars > 0,
        (n_chars - F.length(F.regexp_replace(text, r"\s", ""))).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]", "")).cast("double")
        / n_chars,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "distinct_ratio": distinct_ratio,
        "mean_word_len": mean_word_len,
        "space_ratio": space_ratio,
        "punct_ratio": punct_ratio,
    }


def quality_score(text: Column, toks: Column | None = None) -> Column:
    """[0,1] heuristic: rewards mid-length docs, diverse vocabulary, sane
    word lengths. Deterministic closed-form so an oracle can replicate it."""
    q = quality_columns(text, toks)
    len_score = F.least(q["n_tokens"].cast("double") / 100.0, F.lit(1.0))
    div_score = q["distinct_ratio"]
    word_score = F.when(
        (q["mean_word_len"] >= 3) & (q["mean_word_len"] <= 10), 1.0
    ).otherwise(0.5)
    return (len_score + div_score + word_score) / 3.0


def quality_score_arrow(text: Column) -> Column:
    """Arrow twin of ``quality_score`` — bit-identical scores from a
    C-backed kernel (same Java-ASCII tokenize mirror as
    ``text_stats_arrow``), for corpus-scale gates where the interpreted
    HOF battery was the allocation hotspot (quality signals were 52 s of
    the 5M-doc text_stats profile, SCALE_NOTES r10). Null text scores
    null (the gate drops it either way; the expression battery's null
    output is session-dependent via size(null)). Everything the kernel
    needs is closure-local, so it ships by value — no sydradb_spark
    import on the workers (the round-10 funnel lesson)."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws_run = re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("double")
    def _q(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            trimmed = t.strip(" ")
            toks = [] if trimmed == "" else ws_run.split(trimmed)
            n = len(toks)
            distinct = float(len(set(toks))) / n if n else 0.0
            mean_wl = float(sum(map(len, toks))) / n if n else 0.0
            len_score = min(n / 100.0, 1.0)
            word_score = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
            out.append((len_score + distinct + word_score) / 3.0)
        return pd.Series(out, dtype="float64")

    return _q(text)


def fingerprint(text: Column) -> Column:
    """Deterministic 16-hex-char document fingerprint (content addressing for
    exact-dup detection and incremental reprocessing)."""
    return F.substring(F.md5(text), 1, 16)


# Winnowing (MOSS-style) fingerprints: Rabin-Karp rolling hashes of char
# k-grams, then the minimum in each sliding window of w hashes. Guarantees a
# shared fingerprint for any matching substring of length >= k + w - 1, which
# is what makes it a *local* fingerprint (partial-overlap detection) where
# md5 is a whole-document one. Parameters small enough that hash values stay
# exact in 64-bit (and in DuckDB's BIGINT for the oracle).
WINNOW_K = 8  # k-gram length (chars)
WINNOW_W = 4  # winnowing window (hashes)
WINNOW_BASE = 257
WINNOW_MOD = (1 << 31) - 1  # Mersenne prime; base^k fits i64 under this mod


def winnow_fingerprints(text: Column, k: int = WINNOW_K, w: int = WINNOW_W) -> Column:
    """Distinct winnowed fingerprint values (array<long>) for a document.

    The rolling hash is inherently sequential per document, which makes it
    the legitimate Pandas-UDF case: nested JVM higher-order functions
    (transform/aggregate per gram) fall back to interpreted evaluation and
    ran ~100x slower than an Arrow-batched kernel. The arithmetic is exact
    integer math, mirrored 1:1 by the DuckDB oracle.

    Vectorized (r16, guide §4.2): the per-character Python loop (one
    interpreted mod-multiply per char, plus a w-slice ``min`` per window)
    is replaced by the closed form of the same polynomial hash —
    ``H_i = ((S[i+k] − S[i]) mod m) · b^(k−1+i) mod m`` with
    ``S = cumsum(c_t · b^(−t) mod m)`` — which is EXACTLY the recurrence's
    value: ``binv^t · b^(k−1+i) ≡ b^(k−1−(t−i)) (mod m)`` term by term,
    and every intermediate stays exact in int64 (codes < 2^21,
    mod < 2^31, products < 2^62; the un-reduced cumsum would need a
    2^32-char document to overflow). Window minima are w−1 vectorized
    ``np.minimum`` passes; ``np.unique`` IS sorted-distinct. Measured
    ~17x on the sf0.1 corpus kernel (see OPTIMIZATION_r16.md); output
    bit-identical (pinned by the pure-Python twin tests)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    base, mod = WINNOW_BASE, WINNOW_MOD
    binv = pow(base, mod - 2, mod)  # mod is prime (Fermat inverse)
    # closure-local power-table cache, NOT a module-level helper: the
    # kernel must stay self-contained so it unpickles on workers that do
    # not have sydradb_spark on sys.path (the r12 bpe_encode lesson; see
    # the verify skill's bare-session gotcha). The cache is built once per
    # task deserialization and grown geometrically — a one-off Python loop
    # of max-doc-length iterations per task, amortized over every doc.
    pows: dict = {}

    def pow_tables(n: int):
        bp, ip = pows.get("t", (None, None))
        if bp is None or len(bp) < n:
            size = 1 << max(12, (n - 1).bit_length())
            bp = np.empty(size, dtype=np.int64)
            ip = np.empty(size, dtype=np.int64)
            bp[0] = ip[0] = 1
            for j in range(1, size):
                bp[j] = bp[j - 1] * base % mod
                ip[j] = ip[j - 1] * binv % mod
            pows["t"] = (bp, ip)
        return bp, ip

    @pandas_udf(ArrayType(LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = (t or "").strip()
            n = len(t)
            if n < k + w - 1:
                out.append([])
                continue
            try:
                # code points == ord(c) for every char; utf-32-le is the
                # vectorized spelling of [ord(c) for c in t]
                codes = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(
                    np.int64
                )
            except UnicodeEncodeError:  # lone surrogates: ord() still works
                codes = np.fromiter(map(ord, t), dtype=np.int64, count=n)
            bp, ip = pow_tables(n + k)
            s = np.empty(n + 1, dtype=np.int64)
            s[0] = 0
            np.cumsum(codes * ip[:n] % mod, out=s[1:])
            L = n - k + 1  # one hash per k-gram
            h = (s[k:] - s[:L]) % mod * bp[k - 1 : k - 1 + L] % mod
            mins = h[: L - w + 1].copy()
            for off in range(1, w):
                np.minimum(mins, h[off : off + L - w + 1], out=mins)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return _winnow(text)


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    # tokenize once in a parent projection (see quality_columns note): the
    # six signals below would otherwise each re-split the document
    pre = docs.select("*", tokens(t).alias("__toks"))
    toks = F.col("__toks")
    q = quality_columns(t, toks)
    return pre.select(
        *docs.columns,
        q["n_tokens"].alias("n_tokens"),
        q["distinct_ratio"].alias("distinct_ratio"),
        q["mean_word_len"].alias("mean_word_len"),
        guess_lang(t, toks).alias("lang_guess"),
        quality_score(t, toks).alias("quality"),
        fingerprint(t).alias("fp"),
    )


def lines_nonempty(text: Column) -> Column:
    """Trimmed non-empty lines of a document."""
    return F.filter(
        F.transform(F.split(text, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def dup_line_ratio(text: Column, lines: Column | None = None) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier line —
    the Gopher-style boilerplate/repetition filter signal. Pure column
    expression (array ops over the per-doc line array); 0 for 0/1-line
    docs. Pass ``lines`` (materialized ``lines_nonempty``) to share the
    line split with other signals (tokenize-once, see quality_columns)."""
    ls = lines_nonempty(text) if lines is None else lines
    n = F.size(ls)
    return F.when(
        n > 1, (n - F.size(F.array_distinct(ls))).cast("double") / n
    ).otherwise(F.lit(0.0))


def word_bigrams(text: Column, toks: Column | None = None) -> Column:
    """Word bigrams WITH duplicates (frequency-carrying, unlike the
    distinct'd ``dedup.word_shingles``); empty array under 2 tokens.

    ``toks`` (tokenize-once): a materialized ``tokens(text)`` column is
    accepted in place of the internal split — for <2-token docs the two
    tokenizations differ ([''] vs []) but both fall in the n<2 branch, so
    the output is identical.

    Shape note: the obvious ``transform(sequence(0, n-2), i ->
    concat(element_at(toks, i+1), element_at(toks, i+2)))`` re-inlines the
    ``split()`` regex into EVERY element_at — Catalyst does not
    common-subexpression-eliminate through lambda bodies — so each row
    re-tokenized 2·(n-1) times: O(n·k) regex passes per doc (same trap
    class as the BM25 per-token tokenize, retrieval.py). ``zip_with``
    over two slices evaluates the token array O(1) times per row —
    ~3.5x on a parallelism-matched sf1 A/B, and the dominant cost of
    repetition_stats before the fix."""
    toks = F.split(F.trim(text), r"\s+") if toks is None else toks
    n = F.size(toks)
    joined = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(n >= 2, joined).otherwise(F.array().cast("array<string>"))


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_lines, dup_line_ratio, top_bigram_ratio) — the repetition
    signals a Gopher-style quality filter cuts on: duplicated lines
    (boilerplate) and a single bigram dominating the text (keyword spam).

    ``top_bigram_ratio`` = occurrences of the most frequent bigram / total
    bigram occurrences. Per-doc bigram counting is ROW-LOCAL — every
    bigram of a doc lives in its own row — so no shuffle is needed at all:
    sort the bigram array and fold it once, tracking the longest run
    (max-frequency bigram in a sorted array = longest equal-run). One
    projection, zero shuffles, zero joins. Docs with <2 tokens get ratio 0.

    Shape history: round 6 A/B'd the exploded shape (explode → count per
    (doc, bigram) → max/sum per doc → join back: TWO full-width shuffles of
    every bigram occurrence plus a doc-key join) against O(n²) per-doc HOF
    frequency counting and kept the exploded shape; the round-9 A/B against
    this O(n log n) sort+run-fold measured 8.2 s → 1.2 s at sf1 (50k docs,
    parallelism-matched, exact-equal output). At 100 TB the win widens:
    the exploded shape shuffles ~every token of the corpus twice, the fold
    shuffles nothing.

    Input is ``spread()`` like shingle_table: a single small parquet file
    arrives in 1-4 splits, and without the repartition the tokenize +
    bigram stage runs on that many cores (a local-bench artifact — at
    scale the source has enough splits and spread() is a no-op).
    """
    from sydradb_spark.util import spread as _spread

    t = F.col(text_col)
    pre = _spread(docs).select(
        "doc_id",
        t.alias("__t"),
        tokens(t).alias("__toks"),
        lines_nonempty(t).alias("__lines"),
    )
    pre = pre.select(
        "doc_id",
        "__t",
        "__lines",
        F.array_sort(word_bigrams(F.col("__t"), F.col("__toks"))).alias("__sbg"),
    )
    r = repetition_columns(
        F.col("__t"), lines=F.col("__lines"), sorted_bigrams=F.col("__sbg")
    )
    return pre.select(
        "doc_id",
        r["n_lines"].alias("n_lines"),
        r["dup_line_ratio"].alias("dup_line_ratio"),
        r["top_bigram_ratio"].alias("top_bigram_ratio"),
    )


def repetition_columns(
    text: Column,
    toks: Column | None = None,
    lines: Column | None = None,
    sorted_bigrams: Column | None = None,
) -> dict[str, Column]:
    """The repetition signals as pure column expressions, so callers (e.g.
    the text_stats contract entry) can fuse them into a single projection
    with the quality columns — no join, no second scan.

    Tokenize-once params (round 10, sf100 GC work): without them this dict
    embeds THREE copies of the line split (n_lines + dup_line_ratio's two
    uses) and TWO copies of the whole tokenize→bigram→array_sort pipeline
    (the fold and its size) — ~6 large transient arrays per row that
    dominated allocation at 5M docs. Callers materialize ``tokens(text)``,
    ``lines_nonempty(text)`` and ``array_sort(word_bigrams(text, toks))``
    in a parent projection and pass them here; every heavy op then runs
    once per row. Output values are bit-identical either way."""
    sorted_bg = (
        F.array_sort(word_bigrams(text, toks))
        if sorted_bigrams is None
        else sorted_bigrams
    )
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        # bigrams are never empty strings ("tok tok"), so prev="" can't
        # match the first element
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    folded = F.aggregate(sorted_bg, init, step)
    nbg = F.size(sorted_bg)
    ls = lines_nonempty(text) if lines is None else lines
    return {
        "n_lines": F.size(ls).cast("long"),
        "dup_line_ratio": dup_line_ratio(text, ls),
        "top_bigram_ratio": F.when(
            nbg > 0, folded["best"].cast("double") / nbg
        ).otherwise(F.lit(0.0)),
    }


def text_stats_arrow(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The WHOLE text_stats signal battery as ONE Arrow pass per document —
    the fusion step after the r10 tokenize-once layering (sf100 residual:
    allocation rate of the interpreted HOF lambdas, SCALE_NOTES r10).

    One mapInPandas kernel computes every signal from a single tokenize /
    line-split / bigram-count per doc in C-backed Python (re, set,
    Counter), replacing ~5 large transient JVM arrays per row with zero.
    Output is BIT-IDENTICAL to the expression battery (quality_columns +
    repetition_columns + bpe_ish_token_count as fused by the text_stats
    contract entry) — the regexes mirror Java's ASCII ``\\s`` and Spark's
    space-only ``trim``, and every division happens in the same IEEE
    double order; pinned by tests/test_pipeline.py::
    test_text_stats_arrow_bit_identical. Null text rows yield null signals
    (the expression battery's null propagation).

    Scale shape: map-only, zero shuffles (identical to the expression
    plan); per-batch cost is pure CPU with no JVM allocation pressure —
    the term that outran GC at 5M in-flight docs."""
    import re

    import pandas as pd

    ws_run = re.compile(r"[ \t\n\x0b\f\r]+")
    # letter<->digit transitions: counting matches of the zero-width
    # pattern over the trimmed text equals counting the extra BPE-ish
    # splits (whitespace blocks a transition, so no cross-token matches) —
    # piece count = non-empty ws tokens + transitions, measured ~2.4x
    # cheaper than running the alternation split
    trans = re.compile(r"(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])")
    ws_chars = " \t\n\x0b\f\r"  # Java/RE2 ASCII \s, as str.count args
    del_punct = {ord(c): None for c in ".,;:!?'\"()[]{}-"}
    schema = (
        "doc_id long, n_chars long, n_tokens long, n_tokens_bpe long, "
        "distinct_ratio double, mean_word_len double, space_ratio double, "
        "punct_ratio double, n_lines long, dup_line_ratio double, "
        "top_bigram_ratio double"
    )
    names = [f.strip().split(" ")[0] for f in schema.split(",")]

    def kernel(batches):
        from collections import Counter

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf[text_col]):
                if t is None:
                    # expression-battery null propagation: counts are null
                    # (size/length of null), but every ratio's when(cond)
                    # sees a null condition and falls to otherwise(0.0)
                    rows.append(
                        (doc_id, None, None, None, 0.0, 0.0, 0.0, 0.0, None, 0.0, 0.0)
                    )
                    continue
                trimmed = t.strip(" ")
                toks = [] if trimmed == "" else ws_run.split(trimmed)
                n_tok = len(toks)
                n_chars = len(t)
                n_bpe = (
                    (n_tok - toks.count("")) + len(trans.findall(trimmed))
                    if trimmed
                    else 0
                )
                distinct = float(len(set(toks))) / n_tok if n_tok else 0.0
                mean_wl = float(sum(map(len, toks))) / n_tok if n_tok else 0.0
                space_r = (
                    float(sum(t.count(c) for c in ws_chars)) / n_chars
                    if n_chars
                    else 0.0
                )
                punct_r = (
                    float(n_chars - len(t.translate(del_punct))) / n_chars
                    if n_chars
                    else 0.0
                )
                lines = [s for s in (x.strip(" ") for x in t.split("\n")) if s]
                n_ln = len(lines)
                dup_r = (
                    float(n_ln - len(set(lines))) / n_ln if n_ln > 1 else 0.0
                )
                if n_tok >= 2:
                    # tokens contain no whitespace, so tuple pairs have the
                    # same max frequency as the " "-joined bigram strings
                    nbg = n_tok - 1
                    top = max(Counter(zip(toks, toks[1:])).values())
                    top_r = float(top) / nbg
                else:
                    top_r = 0.0
                rows.append(
                    (
                        doc_id,
                        n_chars,
                        n_tok,
                        n_bpe,
                        distinct,
                        mean_wl,
                        space_r,
                        punct_r,
                        n_ln,
                        dup_r,
                        top_r,
                    )
                )
            yield pd.DataFrame(rows, columns=names)

    return docs.select("doc_id", text_col).mapInPandas(kernel, schema)


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token windows — the chunking step a
    training/RAG pipeline runs before tokenization or embedding.

    Output: ``(doc_id, chunk_idx, chunk_start, chunk_text, n_chunk_tokens)``.
    Chunks start at multiples of ``stride = chunk_size - overlap``; the final
    start is the smallest multiple of stride whose window reaches the end of
    the document, so every token is covered exactly once past the overlap and
    no redundant all-overlap tail chunk is emitted. Documents with zero
    tokens produce zero chunks.

    Scale shape: tokenize → closed-form start list → ``posexplode`` → array
    ``slice`` — a purely narrow per-row expansion, zero shuffles, output rows
    ≈ input tokens / stride regardless of document skew (one pathological
    100 MB doc expands in its own task without a repartition).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # smallest multiple of stride with start + chunk_size >= n (0 if the doc
    # fits in one chunk); integer arithmetic only so the oracle is exact
    over = n - F.lit(chunk_size) + F.lit(stride - 1)
    start_max = F.when(
        n <= chunk_size, F.lit(0)
    ).otherwise((over - (over % stride)).cast("int"))
    base = docs.select(
        "doc_id", toks.alias("__tk"), n.alias("__n"), start_max.alias("__smax")
    ).where(F.col("__n") > 0)
    exploded = base.select(
        "doc_id",
        "__tk",
        "__n",
        F.posexplode(F.sequence(F.lit(0), F.col("__smax"), F.lit(stride))).alias(
            "chunk_idx", "chunk_start"
        ),
    )
    chunk = F.slice(F.col("__tk"), F.col("chunk_start") + 1, chunk_size)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.least(F.col("__n") - F.col("chunk_start"), F.lit(chunk_size))
        .cast("long")
        .alias("n_chunk_tokens"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    max_fp_docs: int = 64,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
) -> DataFrame:
    """(a, b, shared, overlap) for document pairs sharing ≥ ``min_shared``
    winnowing fingerprints — CONTAINMENT detection (a quoted paragraph, a
    mirrored section) that whole-document Jaccard scores near zero.
    ``overlap`` = shared / min(|fp_a|, |fp_b|) ∈ (0, 1]: the fraction of the
    smaller document's fingerprint mass found in the other, i.e. an estimate
    of how much of it is contained.

    Scale shape (same discipline as `dedup.lsh_candidate_pairs`): explode
    fingerprints → drop any fingerprint present in > ``max_fp_docs``
    documents via ``util.drop_hot_keys`` (a boilerplate hash shared by 1M
    docs would otherwise mean 10¹² pairs; see the helper for why a window
    count and not a count-join — the join-back shape OOM'd at 100x data)
    → per-fingerprint doc lists + map-side i<j pair expansion (bounded
    ≤ max_fp_docs²/2 per fingerprint) → one combining
    ``groupBy(a, b).count()`` for the shared totals. No all-pairs stage
    anywhere; the per-doc size join is key-bounded.
    """
    from sydradb_spark.util import drop_hot_keys

    fps = _spread_docs(docs).select(
        "doc_id", winnow_fingerprints(F.col(text_col), k, w).alias("__fps")
    )
    sizes = fps.select("doc_id", F.size("__fps").alias("__nfp")).where(
        F.col("__nfp") > 0
    )
    ex = fps.select("doc_id", F.explode("__fps").alias("fp"))
    ex = drop_hot_keys(ex, ["fp"], max_fp_docs)
    buckets = (
        ex.groupBy("fp").agg(F.collect_list("doc_id").alias("ids")).where(F.size("ids") >= 2)
    )
    ids = F.array_sort(F.col("ids"))
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    shared = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("__nfp").alias("__na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("__nfp").alias("__nb"))
    return (
        shared.join(sa, on="a")
        .join(sb, on="b")
        .select(
            "a",
            "b",
            "shared",
            F.round(
                F.col("shared") / F.least(F.col("__na"), F.col("__nb")), 6
            ).alias("overlap"),
        )
    )


# --- winnowing build/query split (round 10) ---------------------------------
# Mirrors the MinHash and BM25 index patterns: the expensive pass (the
# per-doc rolling-hash Pandas UDF + the 608M-row-at-sf100 fingerprint
# explosion) is materialized ONCE, fingerprint-partitioned, and containment
# queries then read only the probe's fingerprint partitions. Rows are
# doc-local, so append-only maintenance is exact (pinned in tests).
WINNOW_FP_BUCKETS = 64
WINNOW_INDEX_VERSION = 1


def winnow_fp_bucket(fp: Column) -> Column:
    """Fingerprint partition key: ``pmod(fp, WINNOW_FP_BUCKETS)``. The
    fingerprint is already a uniform rolling hash mod a Mersenne prime, so
    a direct pmod spreads buckets evenly without a second hash — and the
    query side can compute a probe's buckets from its fingerprints alone."""
    return F.pmod(fp, F.lit(WINNOW_FP_BUCKETS)).cast("int")


def winnow_index(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, nfp, fp) — one row per (document, distinct fingerprint),
    with the document's fingerprint count riding every row (BM25's
    ``dl``-on-the-posting pattern: overlap scoring needs no doc-table
    join). Every row derives from its own document alone."""
    fps = (
        _spread_docs(docs)
        .select(
            "doc_id", winnow_fingerprints(F.col(text_col), k, w).alias("__fps")
        )
        .where(F.size("__fps") > 0)
    )
    return fps.select(
        "doc_id", F.size("__fps").alias("nfp"), F.explode("__fps").alias("fp")
    )


def winnow_write_index(
    docs: DataFrame,
    path: str,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
) -> None:
    """Materialize the winnowing fingerprint index fingerprint-partitioned:
    ``{path}/fps/fpb=<bucket>/part-*.parquet``. A containment query reads
    only its probe fingerprints' buckets (directory-level partition
    pruning — the same inverted-index seek as ``bm25_write_index``).
    Append-only maintenance stays exact because rows are doc-local:
    ``winnow_index(new_batch).withColumn('fpb', winnow_fp_bucket(F.col('fp')))
    .write.mode('append').partitionBy('fpb').parquet(f'{path}/fps')``.

    At sf100 the fused ``winnow_overlap_pairs`` spent 837 s/query mostly
    re-materializing 608M fingerprint rows (r9 bench); this split pays
    that once."""
    idx = winnow_index(docs, k, w, text_col).withColumn(
        "fpb", winnow_fp_bucket(F.col("fp"))
    )
    # cluster by the partition column before the partitioned write (r16,
    # guide §6 small files): unshuffled, EVERY scan task writes a file into
    # EVERY bucket dir it sees — tasks × buckets files (measured 2048 data
    # files for a 540k-row index at sf0.1, write 4.7 s of the 5.9 s build).
    # One narrow shuffle keyed on fpb makes it one file per bucket. The
    # sort leads with fpb — the dynamic-partition write REQUIRES an
    # ordering on the partition column and would otherwise stack its own
    # Sort and drop ours (the storage.write_points r16 finding) — and the
    # fp secondary gives row-group min/max stats the query side's
    # fingerprint semi-join can skip on.
    n_tasks = int(idx.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    (
        idx.repartition(n_tasks, F.col("fpb"))
        .sortWithinPartitions("fpb", "fp")
        .write.mode("overwrite")
        .partitionBy("fpb")
        .parquet(f"{path}/fps")
    )
    with open(f"{path}/_INDEX_VERSION", "w") as fh:
        fh.write(f"{WINNOW_INDEX_VERSION}\n")


def winnow_read_index(spark, path: str) -> DataFrame:
    """Read a ``winnow_write_index`` layout (carries the ``fpb`` partition
    column that activates pruning in ``winnow_query_index``). Fails fast
    on a version-marked layout this build doesn't read."""
    import os

    ver_file = f"{path}/_INDEX_VERSION"
    if os.path.exists(ver_file):
        with open(ver_file) as fh:
            ver = fh.read().strip()
        if ver != str(WINNOW_INDEX_VERSION):
            raise ValueError(
                f"winnow index at {path} has layout version {ver}, this "
                f"build reads version {WINNOW_INDEX_VERSION} — rebuild it "
                "with winnow_write_index"
            )
    return spark.read.parquet(f"{path}/fps")


def winnow_query_index(
    index: DataFrame,
    probes: DataFrame,
    min_shared: int = 2,
    max_fp_docs: int = 64,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    text_col: str = "text",
) -> DataFrame:
    """(probe_id, doc_id, shared, overlap) — containment hits of each probe
    document against a materialized winnow index; the warm path of the
    build/query split. Semantics match ``winnow_overlap_pairs`` restricted
    to pairs involving a probe (pinned in tests): ``shared`` counts common
    fingerprints, ``overlap`` = shared / min(|fp_probe|, |fp_doc|), hot
    fingerprints (shared by > ``max_fp_docs`` INDEX documents — index
    doc-frequency, the scalable reading of the fused op's corpus
    doc-frequency) are dropped, and a probe that is itself indexed never
    matches itself.

    Scale shape: the probe side is small by contract; its fingerprints
    broadcast. The index scan is pruned to the probes' fingerprint buckets
    (``fpb`` isin — directory-level, ≤ WINNOW_FP_BUCKETS values collected
    from the probe frame, never from the corpus). The hot-fingerprint
    guard counts per-fp doc frequency AMONG the pruned candidate rows
    (probe-bounded, map-side partial agg), so no corpus-wide aggregate
    runs at query time."""
    pf = winnow_index(probes, k, w, text_col).select(
        F.col("doc_id").alias("probe_id"),
        F.col("nfp").alias("__qnfp"),
        "fp",
    )
    bks = sorted(
        r["b"]
        for r in pf.select(winnow_fp_bucket(F.col("fp")).alias("b"))
        .distinct()
        .collect()
    )
    cand = index
    if "fpb" in index.columns:
        cand = cand.where(F.col("fpb").isin(bks))
    cand = cand.join(
        F.broadcast(pf.select("fp").distinct()), on="fp", how="semi"
    )
    # index rows are (doc, distinct fp), so count(*) per fp == doc frequency
    hot = (
        cand.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_fp_docs)
        .select("fp")
    )
    cand = cand.join(F.broadcast(hot), on="fp", how="anti")
    hits = cand.join(F.broadcast(pf), on="fp").where(
        F.col("doc_id") != F.col("probe_id")
    )
    return (
        hits.groupBy("probe_id", "doc_id", "__qnfp", "nfp")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
        .select(
            "probe_id",
            "doc_id",
            "shared",
            F.round(
                F.col("shared") / F.least(F.col("__qnfp"), F.col("nfp")), 6
            ).alias("overlap"),
        )
    )


def _spread_docs(docs: DataFrame) -> DataFrame:
    from sydradb_spark.util import spread

    return spread(docs)


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — corpus distinct-word frequencies: one combining
    shuffle, output Zipf-bounded. Shared base of `vocab_topk` and the BPE
    trainer (`pipeline.bpe`)."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def vocab_topk(docs: DataFrame, n: int = 50_000, text_col: str = "text") -> DataFrame:
    """(token, count, rank) for the corpus's ``n`` most frequent whitespace
    tokens — the vocabulary sweep run before tokenizer training and for
    vocabulary-coverage decisions.

    Scale shape: explode → map-side-combining ``groupBy(token)`` (shuffle
    bounded by DISTINCT tokens — Zipf-bounded, not corpus-bounded) →
    ``orderBy().limit(n)`` which Catalyst fuses to ``TakeOrderedAndProject``
    (per-partition heaps, no global sort). The rank window runs on the
    already-limited n rows, so the single-partition window is bounded by
    ``n``, never by the corpus. Ties break on the token string, so the
    cut at rank n is deterministic.
    """
    counts = word_freq_table(docs, text_col).select(
        F.col("word").alias("token"), F.col("freq").alias("count")
    )
    return vocab_topk_from_counts(counts, n)


def vocab_topk_from_counts(counts: DataFrame, n: int) -> DataFrame:
    """``vocab_topk`` over an already-aggregated (token, count) frame —
    the r16 share point: a caller that also needs ``token_coverage`` can
    aggregate the corpus once and derive both from the counts table (which
    is Zipf-bounded, so sharing it is a bounded persist, never a corpus
    one). Same TakeOrderedAndProject shape, same deterministic tie-break."""
    from pyspark.sql.window import Window

    top = counts.orderBy(F.col("count").desc(), "token").limit(n)
    w = Window.orderBy(F.col("count").desc(), "token")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def token_coverage(
    docs: DataFrame, vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One row ``(total_tokens, covered_tokens, coverage)``: the fraction of
    corpus token OCCURRENCES found in ``vocab`` (a frame with a ``token``
    column) — the number that decides whether a vocabulary is big enough.
    Vocabularies are small next to a corpus → ONE pass over the exploded
    token stream: broadcast left join with a hit indicator, then a single
    combining aggregate (a separate total/covered pair would scan and
    re-tokenize the corpus twice)."""
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    marked = toks.join(
        F.broadcast(
            vocab.select("token").distinct().withColumn("__hit", F.lit(1))
        ),
        on="token",
        how="left",
    )
    return marked.agg(
        F.count("*").alias("total_tokens"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("covered_tokens"),
    ).select(
        "total_tokens",
        "covered_tokens",
        F.when(
            F.col("total_tokens") > 0,
            F.round(F.col("covered_tokens") / F.col("total_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("coverage"),
    )


def token_coverage_from_counts(counts: DataFrame, vocab: DataFrame) -> DataFrame:
    """``token_coverage`` computed from an already-aggregated (token, count)
    frame instead of re-exploding the corpus (r16, guide §2.4): occurrence
    totals are sums over the distinct-token counts — integers, so the
    result is EXACTLY ``token_coverage(docs, vocab)`` whenever ``counts``
    aggregates the same tokenize (pinned by
    ``test_token_coverage_from_counts_matches_stream``). One pass over the
    Zipf-bounded counts table; the corpus is never touched."""
    marked = counts.join(
        F.broadcast(
            vocab.select("token").distinct().withColumn("__hit", F.lit(1))
        ),
        on="token",
        how="left",
    )
    return marked.agg(
        F.coalesce(F.sum("count"), F.lit(0)).cast("long").alias("total_tokens"),
        F.coalesce(F.sum(F.when(F.col("__hit") == 1, F.col("count"))), F.lit(0))
        .cast("long")
        .alias("covered_tokens"),
    ).select(
        "total_tokens",
        "covered_tokens",
        F.when(
            F.col("total_tokens") > 0,
            F.round(F.col("covered_tokens") / F.col("total_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("coverage"),
    )


def train_bigram_lm(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, c12, c1) — word-bigram counts with their left-unigram
    totals: the model table of a CCNet-style n-gram LM quality filter.
    Two combining shuffles (bigram count, unigram count) + one key-bounded
    join; table size is bounded by distinct bigrams (Zipf), not corpus.
    Persist it partitioned by ``w1`` and the scorer's join co-locates."""
    bg = (
        docs.select(F.explode(word_bigrams(F.col(text_col))).alias("bg"))
        .select(
            F.split(F.col("bg"), " ").getItem(0).alias("w1"),
            F.split(F.col("bg"), " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    uni = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return bg.join(uni, on="w1")


def lm_score_docs(
    docs: DataFrame,
    lm: DataFrame,
    alpha: float = 0.4,
    vocab_size: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — mean per-bigram log-probability of
    each document under the bigram LM, with add-alpha smoothing
    P(w2|w1) = (c12 + α) / (c1 + α·V). Low avg_logprob = unnatural text
    (keyboard mash, SEO spam, wrong-language) — the perplexity-bucket
    signal a quality pipeline cuts on. Docs with < 2 tokens are still
    emitted, with n_bigrams 0 and avg_logprob NULL (a scorer that silently
    drops rows breaks 'every doc has a score' joins downstream).

    Scale shape: the doc side explodes to bigrams (narrow), left-joins the
    model on (w1, w2) then (w1) — both key-bounded shuffles against the
    Zipf-bounded model table — and one combining per-doc aggregate. Exactly
    mirrorable in SQL, so the whole scorer is oracle-checkable.
    """
    import math

    la, lav = float(alpha), float(alpha) * vocab_size
    ex = docs.select(
        "doc_id", F.explode(word_bigrams(F.col(text_col))).alias("bg")
    ).select(
        "doc_id",
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
        F.split(F.col("bg"), " ").getItem(1).alias("w2"),
    )
    model = lm.select("w1", "w2", "c12")
    uni = lm.select("w1", "c1").distinct()
    scored = (
        ex.join(model, on=["w1", "w2"], how="left")
        .join(uni, on="w1", how="left")
        .select(
            "doc_id",
            (
                F.log(F.coalesce(F.col("c12"), F.lit(0)) + F.lit(la))
                - F.log(F.coalesce(F.col("c1"), F.lit(0)) + F.lit(lav))
            ).alias("__lp"),
        )
    )
    # 9dp-then-6dp double rounding (same scheme as contract.base.rq): the
    # avg sums doubles in engine-dependent order, so a plain round(x, 6)
    # can flip the last digit between engines on half-boundary values; the
    # pre-round absorbs the ulp noise first. |avg_logprob| ~ O(10), well
    # inside the scheme's 9e6 domain.
    stab = F.round(F.round(F.avg("__lp") * 1e9) / 1e3) / 1e6
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        stab.alias("avg_logprob"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            "avg_logprob",
        )
    )


def compression_ratio(docs: DataFrame, text_col: str = "text", level: int = 6) -> DataFrame:
    """(doc_id, n_bytes, n_compressed, ratio) — zlib compressibility per
    document: highly compressible text (ratio near 0) is repetitive
    boilerplate/spam, incompressible (near 1) is noise — the two tails a
    corpus quality filter trims (the Gopher/RefinedWeb compression cut).

    Arrow-batched kernel (justified: zlib is an opaque sequential codec —
    no column-expression equivalent); zlib output is deterministic for a
    given level, so tests oracle it with the same stdlib call. Empty docs
    get ratio NULL."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_t = StructType(
        [
            StructField("n_bytes", LongType()),
            StructField("n_compressed", LongType()),
            StructField("ratio", DoubleType()),
        ]
    )

    @pandas_udf(out_t)
    def _comp(texts: pd.Series) -> pd.DataFrame:
        import zlib

        rows = []
        for t in texts:
            b = (t or "").encode("utf-8")
            if not b:
                rows.append((0, 0, None))
                continue
            c = len(zlib.compress(b, level))
            rows.append((len(b), c, round(c / len(b), 6)))
        return pd.DataFrame(rows, columns=["n_bytes", "n_compressed", "ratio"])

    return docs.select("doc_id", _comp(F.col(text_col)).alias("__c")).select(
        "doc_id",
        F.col("__c.n_bytes").alias("n_bytes"),
        F.col("__c.n_compressed").alias("n_compressed"),
        F.col("__c.ratio").alias("ratio"),
    )


def corpus_sketch_stats(docs: DataFrame, text_col: str = "text", rsd: float = 0.02) -> DataFrame:
    """One-row approximate corpus profile — the 100 TB-scale version of the
    questions `corpus_stats` answers exactly per source:

    - ``approx_vocab``: HyperLogLog++ distinct-token estimate
      (`approx_count_distinct`, ``rsd`` relative error). The exact
      equivalent shuffles every distinct token corpus-wide; the sketch is
      map-side partials of a few KB merged on one reducer.
    - ``p50/p90/p99_tokens``: `percentile_approx` over per-doc token counts
      (Greenwald-Khanna, bounded state — an exact percentile would sort the
      corpus).
    - ``n_docs`` / ``total_tokens``: exact (plain combining sums).

    Deliberately NOT driver-contract-checked: sketches are
    implementation-defined, so there is no cross-engine oracle — accuracy
    is pinned against exact answers in pytest at small scale instead.
    """
    toks = tokens(F.col(text_col))
    per_doc = docs.select(F.size(toks).alias("__n"), toks.alias("__t"))
    counts = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("__n").cast("long").alias("total_tokens"),
        F.percentile_approx("__n", 0.5).cast("long").alias("p50_tokens"),
        F.percentile_approx("__n", 0.9).cast("long").alias("p90_tokens"),
        F.percentile_approx("__n", 0.99).cast("long").alias("p99_tokens"),
    )
    vocab = (
        per_doc.select(F.explode("__t").alias("__tok"))
        .agg(F.approx_count_distinct("__tok", rsd=rsd).alias("approx_vocab"))
    )
    # two 1-row aggregates → one profile row; the cross join is 1×1
    return counts.crossJoin(vocab)
