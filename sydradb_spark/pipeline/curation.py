"""Corpus-curation utilities a training-data pipeline needs around dedup:
benchmark decontamination, PII redaction, and deterministic sampling.

Scale design:
- Decontamination joins the corpus n-gram stream against the BENCHMARK n-gram
  set. Benchmarks are tiny relative to a 100 TB corpus (MBs of eval text), so
  the benchmark side is distinct-hashed and broadcast: the corpus side is a
  narrow explode → broadcast-hash-join, and only MATCHING grams reach the
  per-doc count shuffle — contamination is rare, so the shuffle is near-empty.
  No corpus-side groupBy ever sees non-matching grams.
- PII redaction is pure ``regexp_replace`` / ``regexp_extract_all`` column
  expressions — JVM-side, whole-stage-codegen, zero shuffle. Patterns avoid
  lookarounds/alternation subtleties so RE2-based oracles (DuckDB) agree
  bit-for-bit with Java regex.
- Hash sampling replaces RNG sampling for reproducibility: membership is a
  pure function of (salt, doc_id), so a 100 TB sample is resumable, stable
  across retries/partitioning, and composable (disjoint salts → independent
  samples; nested fractions → nested samples). Zero shuffle, prunes at scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sydradb_spark.pipeline.hashing import hash64

DECONTAM_NGRAM = 5  # word n-gram width for benchmark-overlap detection

# Cross-engine-safe PII patterns (no lookarounds; greedy quantifiers only, so
# Java regex and RE2 find identical leftmost matches).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def ngram_hashes(text: Column, n: int = DECONTAM_NGRAM) -> Column:
    """Distinct hashed word n-grams of ``text`` (empty array when < n words).
    Same md5-based hash64 family as dedup, so oracles reproduce exactly.
    Gram strings come from `dedup.kgram_strings` (slice/zip_with shape —
    see its docstring for the element_at-in-lambda re-tokenize trap the
    former sequence/transform form paid)."""
    from sydradb_spark.pipeline.dedup import kgram_strings

    cnt = F.size(F.split(F.trim(text), r"\s+"))
    joined = F.transform(kgram_strings(text, n), lambda g: hash64(g))
    return F.when(cnt >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<long>")
    )


def benchmark_ngram_set(bench: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct n-gram hashes of the benchmark corpus — the broadcast side."""
    return (
        bench.select(F.explode(ngram_hashes(F.col(text_col))).alias("gh"))
        .distinct()
    )


def contamination_report(
    docs: DataFrame, bench: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_contaminated) for every doc sharing ≥1 word n-gram with the
    benchmark set. Docs with zero overlap are not emitted (at corpus scale
    that's almost everything — the report is the exception list)."""
    grams = docs.select(
        "doc_id", F.explode(ngram_hashes(F.col(text_col))).alias("gh")
    )
    hits = grams.join(F.broadcast(benchmark_ngram_set(bench, text_col)), on="gh")
    return hits.groupBy("doc_id").agg(F.count("*").alias("n_contaminated"))


def decontaminate(
    docs: DataFrame, bench: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop every doc that shares a word n-gram with the benchmark corpus —
    the standard eval-leakage guard run before training. Anti-join against
    the (small) contaminated-id set."""
    bad = contamination_report(docs, bench, text_col).select("doc_id")
    return docs.join(bad, on="doc_id", how="anti")


def redact_pii(text: Column) -> dict[str, Column]:
    """Columns: ``redacted`` text (emails → <EMAIL>, IPv4 → <IP>) and match
    counts. Pure JVM regex — no UDF, no shuffle."""
    n_emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    # redact emails FIRST so an IPv4-shaped domain fragment can't double-count
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(no_email, F.lit(IPV4_RE), F.lit(0)))
    return {
        "redacted": F.regexp_replace(no_email, IPV4_RE, "<IP>"),
        "n_emails": n_emails.cast("long"),
        "n_ips": n_ips.cast("long"),
    }


def pii_redact_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, redacted, n_emails, n_ips) per document."""
    r = redact_pii(F.col(text_col))
    return docs.select(
        "doc_id",
        r["redacted"].alias("redacted"),
        r["n_emails"].alias("n_emails"),
        r["n_ips"].alias("n_ips"),
    )


SAMPLE_BUCKETS = 1_000_000


def _bucket(salt: str, key_col: str) -> Column:
    """The shared deterministic sampling bucket: hash64(salt:key) mod 1e6.
    Every sampling surface (hash_sample, train_split, mix_corpus,
    stratified_sample) MUST route through this one expression — divergent
    copies would silently break the nested/independent-sample guarantees."""
    return F.pmod(
        hash64(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))),
        F.lit(SAMPLE_BUCKETS),
    )


def hash_sample(
    docs: DataFrame,
    fraction: float,
    salt: str = "s0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic ``fraction`` sample: keep rows whose
    hash64(salt || key) mod 1e6 falls below fraction·1e6.

    Reproducible under retries and repartitioning (membership is a pure
    row function), composable (different salts are independent; a 1% sample
    is a subset of the 10% sample at the same salt only if thresholds nest —
    they do, since the bucket is fixed per row). This is how large pipelines
    take stable train/dev splits; rand()-based sampling can't replay."""
    bucket = _bucket(salt, key_col)
    # round, not truncate: 0.3 * 1e6 is 299999.99…; round keeps the
    # threshold the number the caller wrote (and what an oracle computes)
    return docs.where(bucket < round(fraction * SAMPLE_BUCKETS))


def train_split(
    docs: DataFrame,
    test_fraction: float = 0.01,
    salt: str = "split0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Adds a ``split`` column ('test' for the deterministic ``test_fraction``
    bucket, else 'train') — same hash-bucket machinery as ``hash_sample``, so
    the split is stable across runs and cluster layouts."""
    bucket = _bucket(salt, key_col)
    return docs.withColumn(
        "split",
        F.when(
            bucket < round(test_fraction * SAMPLE_BUCKETS), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    docs: DataFrame,
    score_col: str,
    fractions: list[float],
    salt: str = "strat0",
    key_col: str = "doc_id",
    cuts: list[float] | None = None,
) -> DataFrame:
    """Quantile-stratified deterministic sampling: rows are bucketed into
    ``len(fractions)`` equal-population strata by ``score_col`` (e.g. the
    quality or LM score), and stratum i keeps the deterministic
    ``fractions[i]`` hash-fraction — the standard way to up-weight
    high-quality tails without discarding the distribution's middle.
    Output keeps a ``stratum`` column (0 = lowest scores).

    Scale shape: stratum boundaries come from ONE `percentile_approx`
    aggregate (GK sketch, bounded state) broadcast as literals into a pure
    row-function CASE — membership stays replayable under retries exactly
    like `hash_sample` (same salt:key bucket machinery). NULL and NaN
    scores are dropped (no evidence to stratify on — NaN would otherwise
    silently land in the TOP stratum under Spark's NaN-is-largest
    ordering, and corrupt the quantile boundaries).

    Boundary ties go UP (``score >= cut`` promotes): a bounded score that
    saturates at its max (many docs at exactly 1.0) must land in the top
    stratum — a strict ``>`` would dump that whole mass into stratum 0
    and sample it at the lowest fraction.

    Pass explicit ``cuts`` (ascending, len(fractions)-1 thresholds) to
    FREEZE the boundaries instead of re-estimating them: incremental
    batches stratified against the corpus-wide boundaries stay consistent
    across runs, and cross-engine checks can share the cut literals.
    """
    n = len(fractions)
    if n < 1:
        raise ValueError("fractions must be non-empty")
    if cuts is not None and len(cuts) != n - 1:
        raise ValueError("cuts must have len(fractions) - 1 thresholds")
    scored = docs.where(
        F.col(score_col).isNotNull() & ~F.isnan(F.col(score_col).cast("double"))
    )
    if cuts is None:
        qs = [i / n for i in range(1, n)]
        cuts = (
            scored.agg(F.percentile_approx(score_col, qs).alias("c")).collect()[0]["c"]
            if n > 1
            else []
        )
    if cuts is None:  # zero scorable rows: empty in, empty out
        cuts = []
    stratum = F.lit(0)
    for i, c in enumerate(cuts):
        stratum = F.when(F.col(score_col) >= float(c), i + 1).otherwise(stratum)
    bucket = _bucket(salt, key_col)
    thresholds = F.array(*[F.lit(round(f * SAMPLE_BUCKETS)) for f in fractions])
    keep = bucket < F.element_at(thresholds, stratum + 1)
    return scored.withColumn("stratum", stratum.cast("int")).where(keep)


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "mix0",
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Weighted training-mix composition: per-source sampling weights with
    epoch replication — the op that turns curated sources into a training
    corpus at chosen proportions.

    Weight semantics (the standard data-mixture contract):
    - ``w == 0`` drops the source;
    - ``w <= 1`` keeps a deterministic w-fraction (same hash-bucket
      machinery as ``hash_sample`` — replayable, nested);
    - ``w > 1`` replicates floor(w) full epochs and hash-samples the
      fractional remainder into one more epoch. Output carries an ``epoch``
      column (0-based) so downstream shuffling can keep replicas apart.

    Scale: the weight table is a broadcast join (dozens of sources); epoch
    expansion is a narrow explode bounded by ceil(w); membership is a pure
    row function — no shuffle anywhere, prunes at the scan when sources are
    partition columns. The fractional threshold is ``round(frac * 1e6)``
    so engines that round vs truncate double→int agree exactly.
    """
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()],
        f"{source_col} string, __w double",
    )
    d = (
        docs.join(F.broadcast(wdf), on=source_col, how="left")
        .na.fill({"__w": float(default_weight)})
        .where(F.col("__w") > 0)
    )
    n_full = F.floor(F.col("__w")).cast("int")
    frac = F.col("__w") - F.floor(F.col("__w"))
    threshold = F.round(frac * SAMPLE_BUCKETS).cast("long")
    bucket = _bucket(salt, key_col)
    out = d.withColumn("epoch", F.explode(F.sequence(F.lit(0), n_full)))
    keep = (F.col("epoch") < n_full) | (bucket < threshold)
    return out.where(keep).drop("__w")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    shards: int = 1,
) -> DataFrame:
    """Greedy sequence packing: assign each doc to a bin so no bin exceeds
    ``budget`` tokens — the batch-construction step before training. Docs are
    packed in ``key_col`` order within each ``group_col`` partition
    (first-fit-on-current-bin: a doc that would overflow closes the bin and
    opens the next). Oversized docs (> budget) get a bin of their own.

    Output: (group, doc_id, n_tokens, bin_id, bin_fill) — ``bin_id`` is
    0-based per group, ``bin_fill`` the running total within the bin.

    Why applyInPandas: bin state is inherently sequential (each assignment
    depends on the running fill), so this is the legitimate Arrow-batched
    kernel case, like the winnowing rolling hash. Parallelism comes from the
    grouping column — each group packs independently (the semantics a real
    pipeline wants anyway: bins never mix sources), so the job scales with
    the number of groups, and determinism is total: the pack is a pure
    function of the (group, ordered keys, token counts) input, independent
    of partitioning or retries.

    ``shards=s > 1`` is the hot-group guard for corpus scale: a group with
    10^8 docs would otherwise pack single-threaded in one task holding the
    whole group. Each doc is hashed (pure function of the key) into one of
    ``s`` sub-shards packed independently, so parallelism becomes
    n_groups × s and per-task state is group_size/s. Bins never span
    shards — exactly as valid as the key-order pack, since within-corpus
    order is an arbitrary choice to begin with; ``bin_id`` encodes the
    shard in the high bits (shard * 2^40 + local bin), so bins stay unique
    per group and the shard is recoverable. shards=1 (default) is the
    classic single-sequence semantics the oracle entry replays."""
    from sydradb_spark.pipeline.text import token_count

    if shards < 1:
        raise ValueError("shards must be >= 1")
    if tokens_col is None:
        docs = docs.withColumn("__ntok", token_count(F.col(text_col)).cast("long"))
        tokens_col = "__ntok"
    slim = docs.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("doc_id"),
        F.col(tokens_col).alias("n_tokens"),
    )
    keys = ["grp"]
    if shards > 1:
        slim = slim.withColumn(
            "__shard", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(shards))
        )
        keys.append("__shard")

    def pack(pdf):
        shard_off = (
            int(pdf["__shard"].iloc[0]) << 40 if "__shard" in pdf.columns else 0
        )
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill, ndocs = 0, 0, 0
        bins, fills = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            # close on any NON-EMPTY bin (doc count, not fill — a bin holding
            # only zero-token docs must still not absorb an oversized doc)
            if ndocs > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
                ndocs = 0
            fill += n
            ndocs += 1
            bins.append(shard_off + bin_id)
            fills.append(fill)
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills
        return pdf[["grp", "doc_id", "n_tokens", "bin_id", "bin_fill"]]

    return slim.groupBy(*keys).applyInPandas(
        pack, "grp string, doc_id long, n_tokens long, bin_id long, bin_fill long"
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    max_docs_per_line: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """C4-style global line dedup: any (non-blank) line that appears in more
    than ``max_docs_per_line`` DISTINCT documents is boilerplate (navigation,
    cookie banners, licence footers) and is removed from every document.

    Returns (doc_id, <text_col> cleaned, n_lines_removed); documents whose
    every line was boilerplate come back with empty text, not dropped.

    Scale shape: three key-bounded shuffles — line-frequency count (map-side
    partial ``countDistinct`` approximated exactly by (line, doc) dedup +
    count), an anti join of the line stream against the boilerplate set, and
    the per-doc rebuild (``collect_list`` of (pos, line) structs, sorted and
    joined map-side). No step is corpus-quadratic; the boilerplate set is
    the only globally-shared state and it's join-keyed, never collected.
    """
    ln = docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    )
    bad = (
        ln.where(F.trim(F.col("line")) != "")
        .select("line", "doc_id")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("__nd"))
        .where(F.col("__nd") > max_docs_per_line)
        .select("line")
    )
    kept = ln.join(bad, on="line", how="anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("__clean"),
        F.count("*").alias("__kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), "\n"))
    return (
        docs.join(rebuilt, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("__clean"), F.lit("")).alias(text_col),
            (n_lines - F.coalesce(F.col("__kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_removed"),
        )
    )


# Control chars to strip: C0 set minus \t (09), \n (0A) — \r is handled by
# the CRLF rewrite before this class applies — plus DEL (7F). Hex escapes are
# identical in Java regex and RE2, so DuckDB oracles agree bit-for-bit.
CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(text: Column, nfc: bool = True) -> Column:
    """Canonical text cleanup — the normalization pass a corpus runs before
    hashing/dedup so byte-level noise doesn't defeat content equality:

    1. Unicode NFC composition (``é`` as one codepoint, not ``e`` + U+0301).
       No JVM builtin exposes ICU normalization through PySpark, so this is
       the legitimate Arrow-batched kernel case (sequential per-string
       library call); skipped when ``nfc=False`` for a pure-codegen pipeline.
    2. CRLF / lone CR → LF.
    3. Strip remaining control characters (C0 minus tab/newline, plus DEL).
    4. Collapse runs of spaces/tabs to a single space.
    5. Strip spaces around newlines.
    6. Collapse 3+ consecutive newlines to 2 (paragraph break).
    7. Trim leading/trailing whitespace.

    Steps 2-7 are pure JVM ``regexp_replace`` chains — whole-stage codegen,
    zero shuffle; every pattern avoids lookarounds so RE2 (DuckDB oracle)
    and Java regex transform identically.
    """
    c = text
    if nfc:
        import unicodedata

        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        @pandas_udf(StringType())
        def _nfc(s: pd.Series) -> pd.Series:
            # str.isascii() is a C-level scan and ASCII is NFC-invariant,
            # so the (typical) all-ASCII row skips the normalizer entirely —
            # measured 30x on a 100k-doc ASCII corpus (122 s -> 4 s)
            return s.map(
                lambda t: t
                if t is None or t.isascii()
                else unicodedata.normalize("NFC", t)
            )

        c = _nfc(c)
    c = F.regexp_replace(c, r"\r\n?", "\n")
    c = F.regexp_replace(c, CONTROL_RE, "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" *\n *", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def normalize_docs(docs: DataFrame, text_col: str = "text", nfc: bool = True) -> DataFrame:
    """(doc_id, <text_col> normalized, changed, n_chars_before, n_chars_after)
    per document — ``changed`` flags rows the cleanup touched (the usual
    monitoring signal for how dirty a source is)."""
    staged = docs.select(
        "doc_id",
        F.col(text_col).alias("__orig"),
        normalize_text(F.col(text_col), nfc=nfc).alias(text_col),
    )
    return staged.select(
        "doc_id",
        text_col,
        (F.col(text_col) != F.col("__orig")).alias("changed"),
        F.length("__orig").cast("long").alias("n_chars_before"),
        F.length(text_col).cast("long").alias("n_chars_after"),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    salt: str = "shard0",
    mode: str = "error",
) -> None:
    """Export a curated corpus as deterministic training shards: each row is
    hash-assigned to ``shard = hash64(salt:key) mod n_shards`` (stable under
    retries, repartitioning, and cluster size — the same replayability
    argument as `hash_sample`), written as one sorted parquet file per shard
    under ``path/shard=K/``.

    Scale shape: one shuffle (`repartition(n_shards, shard)` — pinned task
    count, the REPARTITION_BY_NUM lesson from the storage writer) +
    `sortWithinPartitions(key)` so every shard file is internally ordered
    and bit-reproducible; readers get deterministic batch order per shard.
    Size shards via ``n_shards`` ≈ corpus_bytes / target_shard_bytes; at
    100 TB with 512 MB shards that is ~200k tasks — within a single Spark
    stage's comfort zone.
    """
    shard = F.pmod(
        hash64(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    (
        docs.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        # sort on (shard, key): the dynamic-partition write requires an
        # ordering on the partition column and would otherwise insert its
        # own Sort above this one — a sort whose spill-merge breaks
        # equal-shard ties arbitrarily, silently unsorting the shard files
        # at exactly the data sizes that spill. Leading with `shard` makes
        # this sort satisfy the writer's requirement, so the key order
        # inside each shard survives verbatim.
        .sortWithinPartitions("shard", key_col)
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )


URL_RE = r"https?://[^\s/$.?#][^\s]*"
DOMAIN_FROM_URL_RE = r"https?://([^\s/:?#]+)"


def extract_domains(text: Column) -> Column:
    """Distinct lowercased domains of the http(s) URLs in a document —
    pure JVM regex, zero shuffle."""
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(text, F.lit(DOMAIN_FROM_URL_RE), F.lit(1)),
            lambda d: F.lower(d),
        )
    )


def domain_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(domain, n_docs) — how many documents cite each domain. The per-domain
    histogram a web-corpus curator cuts blocklists and mix weights from.
    One explode + one combining shuffle on domain."""
    return (
        docs.select("doc_id", F.explode(extract_domains(F.col(text_col))).alias("domain"))
        .groupBy("domain")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )


def filter_blocked_domains(
    docs: DataFrame, blocked: DataFrame | list[str], text_col: str = "text"
) -> DataFrame:
    """Drop documents citing any blocked domain. ``blocked`` is a frame with
    a ``domain`` column or a plain list; blocklists are small → broadcast
    anti-join against the doc→domain stream (the same shape as benchmark
    decontamination)."""
    spark = docs.sparkSession
    if isinstance(blocked, list):
        blocked = spark.createDataFrame([(d.lower(),) for d in blocked], "domain string")
    doc_domains = docs.select(
        "doc_id", F.explode(extract_domains(F.col(text_col))).alias("domain")
    )
    bad_docs = doc_domains.join(
        F.broadcast(blocked.select(F.lower(F.col("domain")).alias("domain"))),
        on="domain",
    ).select("doc_id").distinct()
    return docs.join(bad_docs, on="doc_id", how="anti")
