"""Deduplication operators over a documents table ``(doc_id long, text
string, ...)`` — exact, MinHash+LSH, SimHash, and n-gram Jaccard.

Scale design (the point of these shapes at 100 TB):
- Exact dedup is one hash-groupBy: a single shuffle on a 16-byte key.
- MinHash-LSH never forms all pairs: candidate pairs come from per-bucket
  pair expansion — cost is Σ bucket², not n² — and exact-Jaccard verification
  happens INSIDE the buckets on each member's shingle set
  (``bucket_verified_pairs``), so the verify shuffle is NUM_BANDS × the
  tokenized corpus no matter how many candidates banding admits (the
  sf100 campaign measured any pairs × shingles join shape at ~400× the
  corpus size). Degenerate buckets (e.g. boilerplate docs collapsing to
  one signature) are the skew risk; the ``max_bucket`` guard bounds them.
- SimHash near-dup uses banded fingerprints (4 bands × 16 bits): by pigeonhole
  any pair within Hamming distance 3 shares at least one exact band, so the
  banded join finds exactly the same pairs as the O(n²) scan.
- All hashing is md5-based (pipeline.hashing) so a DuckDB oracle reproduces
  results bit-for-bit; swap hash64 → xxhash64 when oracle parity isn't needed.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sydradb_spark.pipeline.hashing import hash64

_LOG = logging.getLogger(__name__)

# MinHash parameters: 16 hashes in 8 bands of r=2 → candidate-pair recall
# 1-(1-j²)^8 (≈0.27 at j=0.2, ≈0.92 at j=0.5, ≈1 at j≥0.8).
NUM_HASHES = 16
BAND_ROWS = 2
NUM_BANDS = NUM_HASHES // BAND_ROWS
SHINGLE_WORDS = 3

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 4 × 8 bits; finds all pairs with hamming <= SIMHASH_BANDS-1

# Default hot-bucket guard threshold shared by the LSH family (minhash bands,
# simhash bands, sign-LSH buckets): a bucket larger than this is boilerplate
# collapse, and expanding it would cost ~bucket²/2 pairs.  Exposed as a module
# constant so DuckDB oracle twins can replay the exact same drop.
LSH_MAX_BUCKET = 1000


from sydradb_spark.util import spread as _spread


# --- exact ------------------------------------------------------------------
def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(content md5, keeper doc_id = min, n_copies) per distinct content.

    One shuffle on the content hash; keeper choice (min doc_id) is
    deterministic so reruns are idempotent.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row (min doc_id) per distinct text.

    ONE shuffle: ``groupBy(md5).agg(min_by(struct(*), doc_id))`` moves each
    row once, keyed by the content hash — perfectly uniform, skew-free by
    construction — and map-side partial aggregation collapses duplicates
    before they ever cross the wire (the heavier the duplication, the less
    is shuffled). The previous shape (groups + semi join back on doc_id)
    shuffled the survivors a second time by doc_id plus the keeper list;
    r9 A/B at sf1: 4.9 s → 3.8 s, exact-equal output, and strictly fewer
    bytes moved at any scale."""
    agg = docs.groupBy(F.md5(F.col(text_col)).alias("__md5")).agg(
        F.min_by(F.struct(*docs.columns), F.col("doc_id")).alias("__r")
    )
    return agg.select("__r.*")


def build_fingerprint_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(content_md5) — the persistent content index of a corpus, written once
    and maintained incrementally (append `incremental_dedup`'s survivors'
    hashes after each batch). Kept as hashes only: at 100 TB the index is
    ~0.03% the corpus size and joins by a 32-char key."""
    return docs.select(F.md5(F.col(text_col)).alias("content_md5")).distinct()


def incremental_dedup(
    new_docs: DataFrame, index: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Continuous-crawl dedup: drop new documents whose content already
    exists in the historical ``index`` (a frame with a ``content_md5``
    column, e.g. a parquet table built by `build_fingerprint_index`), then
    exact-dedup the survivors within the batch.

    Scale shape: one anti join on the 16-byte hash — Spark broadcasts the
    index when it fits, otherwise a shuffle-hash join keyed exactly like
    the index table's layout (persist the index bucketed by content_md5 and
    the join co-locates) — plus `exact_dedup`'s single combining shuffle for
    the in-batch duplicates. The batch is the small side at steady state;
    nothing rescans the historical corpus text.
    """
    fresh = new_docs.join(
        index.select("content_md5").distinct(),
        F.md5(F.col(text_col)) == F.col("content_md5"),
        how="left_anti",
    )
    return exact_dedup(fresh, text_col)


# --- shingles ----------------------------------------------------------------
def kgram_strings(text: Column, k: int) -> Column:
    """All k-word grams of ``text`` (with duplicates), as space-joined
    strings; total — docs with fewer than k tokens yield an empty array
    (the slice length is clamped to >= 0 internally, so callers need no
    ``n >= k`` guard; r8 ADVICE).

    Shape note (round 8): the obvious ``transform(sequence(0, n-k), i ->
    concat_ws(element_at(toks, i+1), ..., element_at(toks, i+k)))``
    re-inlines the ``split()`` regex into every element_at — Catalyst does
    not common-subexpression-eliminate through lambda bodies — so every
    row was re-tokenized k·(n-k+1) times: O(n·k) regex passes per doc,
    the dominant cost of the whole shingle pipeline (same trap class as
    the r07 BM25 per-token tokenize, retrieval.py:61). Folding k SLICES of
    the token array with zip_with evaluates the split O(k) times per ROW
    instead: 3.6x on a parallelism-matched sf1 shingle_table A/B."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    length = F.greatest(n - F.lit(k - 1), F.lit(0))
    acc = F.slice(toks, 1, length)
    for d in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(toks, d + 1, length),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return acc


def word_shingles(text: Column, k: int = SHINGLE_WORDS) -> Column:
    """Distinct k-word shingles; docs with < k tokens yield an empty array."""
    n = F.size(F.split(F.trim(text), r"\s+"))
    return F.when(n >= k, F.array_distinct(kgram_strings(text, k))).otherwise(
        F.array().cast("array<string>")
    )


def shingle_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) exploded — the shared input of MinHash and exact
    Jaccard verification."""
    return _spread(docs).select(
        "doc_id", F.explode(word_shingles(F.col(text_col))).alias("sh")
    )


def shingle_arrays(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, arr: array<long>) — each doc's distinct shingle set as
    60-bit ``hash64`` values, one array row per doc; the map-only
    verify-side input of ``bucket_verified_pairs`` (zero shuffle — the
    round-9 tokenization A/B measured the split+fold chain as ~free over
    the scan, so recomputing it beats persisting an exploded table).

    HASHED, not the strings (round 9, second sf100 lesson): carrying the
    shingle STRINGS into the buckets made the verify shuffle
    NUM_BANDS × ~2 KB/doc (~80 GB raw for the 5M-doc/560 MB corpus —
    measured 59 GB of shuffle on disk before the run was cut); 8-byte
    hashes cut the carried payload ~4×. Exactness is preserved because
    the DuckDB twin intersects the SAME md5-based hash64 values — a
    60-bit collision would merge two shingles in BOTH engines' sets
    identically (P ≈ |union|²/2^61 per doc pair, same family the MinHash
    signatures already ride), so the gate comparison cannot drift."""
    return _spread(docs).select(
        "doc_id",
        F.array_distinct(
            F.transform(word_shingles(F.col(text_col)), lambda g: hash64(g))
        ).alias("arr"),
    )


# --- MinHash + LSH ------------------------------------------------------------
# Hash family: one md5-based base hash per shingle reduced mod the Mersenne
# prime p = 2^31-1, then NUM_HASHES universal-hash variants
# h_i = (A[i] * h + B[i]) mod p with A in [1, p-1], B in [0, p-1). One hash
# computation and ONE map-side-combining shuffle (16 min-aggregates as
# columns) instead of a 16x row explosion. A*h < 2^62, so the arithmetic is
# overflow-free in int64 on any engine.
#
# The modulus choice is load-bearing: an earlier variant used
# mod (2^61-1) with A, h < 2^31 — the product wraps that modulus AT MOST
# ONCE, so h_i is near-monotone in h and all 16 "independent" minima pick
# the same argmin shingle. Measured candidate recall at j=0.689 was 0.62
# against a theoretical 0.994 (test_minhash_recall_measured is the guard;
# the per-pair oracle can't see it because it replays the same family).
# With p = 2^31-1 the product wraps ~A times → genuinely pairwise-
# independent permutations; measured recall matches theory. The 31-bit
# base hash can collide at billion-shingle scale, but collisions only
# CREATE shared minima (never destroy), and the exact-Jaccard verify step
# filters any false candidates they cause.
MINHASH_P = (1 << 31) - 1
MINHASH_M = MINHASH_P
MINHASH_A = [(i * 2654435761 + 12345) % (MINHASH_M - 1) + 1 for i in range(NUM_HASHES)]
MINHASH_B = [(i * 1013904223 + 54321) % MINHASH_M for i in range(NUM_HASHES)]


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, m0..m{NUM_HASHES-1}) MinHash signature columns from
    shingle_table() output."""
    return minhash_signatures_hashed(
        sh.select("doc_id", hash64(F.col("sh")).alias("__h64"))
    )


def minhash_signatures_hashed(hashed: DataFrame, col: str = "__h64") -> DataFrame:
    """Signatures from an already-hashed (doc_id, ``col``: hash64) frame —
    the r15 single-tokenize route: ``shingle_arrays`` already carries each
    doc's distinct shingle hash64 values, so exploding that array feeds the
    same min-aggregates WITHOUT re-tokenizing the corpus a second time.
    Value-identical to the string route: hash64(sh) per distinct shingle is
    the same number either way, and a (astronomically rare) within-doc
    hash64 collision collapses two equal values — invisible to min()."""
    h = F.pmod(F.col(col), F.lit(MINHASH_M))
    cols = hashed.select(
        "doc_id",
        *[
            ((F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)).alias(
                f"h{i}"
            )
            for i in range(NUM_HASHES)
        ],
    )
    return cols.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(NUM_HASHES)]
    )


def minhash_signatures_from_arrays(
    arrays: DataFrame, arr_col: str = "arr", keep_arr: bool = False
) -> DataFrame:
    """(doc_id, m0..m{NUM_HASHES-1}) signatures computed DOC-LOCALLY from a
    ``shingle_arrays``-shaped frame (one row per doc, ``arr``: the doc's
    distinct shingle hash64 values) in one vectorized Arrow kernel.

    This removes BOTH halves of the exploded route (r16, guide §2.4/§4.2):
    the explode multiplied the frame by shingles/doc (~150×) only so a
    16-column projection could feed a hash aggregate, and the
    ``groupBy(doc_id)`` min-aggregation was a full corpus-keyed SHUFFLE.
    The signature of a doc depends on its own array alone, so the kernel
    computes all 16 minima per doc in a map-only pass — zero shuffle, no
    row multiplication; at 100 TB the explode+shuffle simply does not
    exist. (The r6 A/B that rejected array-form signatures measured JVM
    ``aggregate()`` HOFs, whose lambdas are interpreted per element — the
    Arrow kernel has neither that cost nor the explode's.)

    EXACTNESS: bit-identical to ``minhash_signatures_hashed`` by
    construction — hash64 values are non-negative 60-bit, so
    ``pmod(h, M) == h % M``; each ``(A_i·h + B_i) % P`` stays < 2^63
    (A_i < 2^31, h mod M < 2^31, products < 2^62) so int64 arithmetic is
    exact on both engines; ``min`` over identical int64 values is
    order-free. Edge semantics replicate the explode: an EMPTY (or NULL)
    array produces no exploded rows, hence no signature row — the kernel
    drops those docs. Input contract: one row per doc (both call sites
    derive from ``shingle_arrays``); the exploded route's groupBy would
    merge duplicate doc_ids, this does not.

    Pinned by ``test_minhash_signature_kernel_matches_exploded_route``
    (real corpus + crafted empty/single/unicode edges).

    ``keep_arr=True`` additionally passes the (filtered) shingle array
    through as ``arr`` — the r16 verify-side fusion: carrying each doc's
    set WITH its signature lets ``bucket_verified_pairs`` skip the
    bands ⋈ arrays join entirely (the anti-join of the hot-bucket guard
    already hash-partitions the carried rows by (band, sig), which the
    bucket collect reuses — one payload shuffle, zero joins).
    """
    slim = arrays.select("doc_id", F.col(arr_col).alias("__arr"))
    id_t = slim.schema["doc_id"].dataType.simpleString()
    out_schema = ", ".join(
        [f"doc_id {id_t}"]
        + (["arr array<long>"] if keep_arr else [])
        + [f"m{i} long" for i in range(NUM_HASHES)]
    )
    a_consts = list(MINHASH_A)
    b_consts = list(MINHASH_B)
    mod_m = MINHASH_M
    mod_p = MINHASH_P
    n_sigs = NUM_HASHES

    # self-contained closure (no module-level helpers): unpickles on workers
    # without the repo on sys.path — the r12 bare-session lesson
    def kern(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            col = batch.column(1)
            n = len(col)
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            base = int(offs[0])
            lo = offs[:-1] - base
            hi = offs[1:] - base
            row_null = col.is_null().to_numpy(zero_copy_only=False)
            # drop docs the explode would drop: NULL or empty arrays
            keep = (~row_null) & (hi > lo)
            if not keep.any():
                continue
            vals = col.values.to_numpy(zero_copy_only=False)[base : int(offs[-1])]
            h = vals % mod_m
            # reduceat over the KEPT rows' start offsets: offsets are
            # contiguous (hi[j] == lo[j+1]), so kept row j's segment
            # [lo_j, next kept lo) covers exactly its own values plus the
            # spans of any dropped rows in between — empty rows span
            # nothing, and a (defensive; Spark never produces one here)
            # NULL slot with a non-empty span holds undefined bytes, which
            # the sentinel mask below excludes from every min. Every kept
            # start is < len(vals) (kept ⇒ lo < hi ≤ len), so the indices
            # are valid, and the final segment ends at the end of the
            # batch's own values slice.
            starts = lo[keep]
            bad = row_null & (hi > lo)
            gmask = None
            if bad.any():
                gmask = np.zeros(len(vals), dtype=bool)
                for j in np.nonzero(bad)[0]:
                    gmask[lo[j] : hi[j]] = True
            mins = []
            for i in range(n_sigs):
                sig = (a_consts[i] * h + b_consts[i]) % mod_p
                if gmask is not None:
                    # larger than any (… % P) value, so never the min
                    sig[gmask] = np.iinfo(np.int64).max
                mins.append(np.minimum.reduceat(sig, starts))
            keep_pa = pa.array(keep)
            cols = [batch.column(0).filter(keep_pa)]
            names = [batch.schema.names[0]]
            if keep_arr:
                cols.append(col.filter(keep_pa))
                names.append("arr")
            cols += [pa.array(m, type=pa.int64()) for m in mins]
            names += [f"m{i}" for i in range(n_sigs)]
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return slim.mapInArrow(kern, out_schema)


def band_signatures(minh: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, band, sig) LSH band signatures from a (doc_id, m0..mN)
    signature frame — per-band signature string (r consecutive minima
    joined). ``carry`` names extra input columns to keep on every band row
    (r16: the verify-side fusion rides the doc's shingle array along)."""
    band_structs = [
        F.struct(
            F.lit(b).cast("long").alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"m{b * BAND_ROWS + r}").cast("string")
                    for r in range(BAND_ROWS)
                ],
            ).alias("sig"),
        )
        for b in range(NUM_BANDS)
    ]
    return minh.select(
        "doc_id", *carry, F.explode(F.array(*band_structs)).alias("bs")
    ).select(
        "doc_id",
        *carry,
        F.col("bs.band").alias("band"),
        F.col("bs.sig").alias("sig"),
    )


def minhash_band_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, band, sig) from a shingle_table() frame (exploded-input
    compatibility path; ``minhash_signatures_narrow`` + ``band_signatures``
    is the zero-shuffle route when you hold the docs frame)."""
    return band_signatures(minhash_signatures(sh))


def lsh_candidate_pairs(
    band_sigs: DataFrame, max_bucket: int | None = LSH_MAX_BUCKET
) -> DataFrame:
    """Distinct (a, b) a<b sharing ≥1 LSH bucket. ``max_bucket`` drops
    degenerate buckets (boilerplate collapse) up front — at scale a single
    1M-doc bucket would mean 10¹² candidate pairs.

    Shape: size-filter via ``util.drop_hot_keys`` (parallel groupBy count
    anti-joined back under an explicit shuffle_hash hint — nothing for
    Catalyst to mis-estimate and broadcast, no single-task hot-key window;
    see the helper's docstring for both rejected shapes). Total cost: the
    count + anti-join shuffles of the band table plus one of the pair set
    (distinct). Pair expansion is a bounded JVM array transform
    (≤ max_bucket²/2 structs per bucket); the sorted id array is HOISTED
    into a column first — referencing ``array_sort(collect_list(...))``
    from inside the transform lambdas would re-run the sort once per
    outer element (the no-CSE-through-lambda trap, see kgram_strings):
    O(n² log n) per full bucket."""
    if max_bucket is not None:
        from sydradb_spark.util import drop_hot_keys

        band_sigs = drop_hot_keys(band_sigs, ["band", "sig"], max_bucket)
    buckets = (
        band_sigs.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def bucket_verified_pairs(
    band_sigs: DataFrame,
    arrays: DataFrame | None,
    threshold: float,
    max_bucket: int | None = LSH_MAX_BUCKET,
) -> DataFrame:
    """Exact near-dup pairs (a, b, jaccard >= threshold), verified INSIDE
    the LSH buckets — the scale shape of the candidate → verify chain.

    Round 9, forced by the sf100 campaign: ANY pair-table × shingle-table
    join materializes ~|pairs| × shingles/doc rows through a shuffle. At
    sf100 (5M docs) r=2 banding admits ~100M candidate pairs (measured —
    every pair with even mild overlap collides on some band), so the join
    shape shuffle-writes ~230 GB for a 560 MB corpus; the candidate-
    filtered ``jaccard_for_pairs`` still died on disk because the
    candidate DOCS were 1.8M of 5M. Carrying each member's shingle SET
    into its bucket instead bounds the verify shuffle at NUM_BANDS × the
    tokenized corpus plus one pair-dedup pass, independent of the
    candidate count:

      bands ⋈ arrays (doc-keyed) → groupBy(band, sig) collect members
      → per-bucket pair expansion computes size(array_intersect) in place
      → distinct (a, b) across bands → jaccard + threshold.

    Exactness: shingle-hash sets are DISTINCT on both engines (the oracle
    intersects the same ``hash64`` values — see ``shingle_arrays``), so
    |array_intersect| equals the oracle's common-hash join count, and
    a pair seen in several buckets carries identical counts from each, so
    the cross-band distinct is value-safe. Skew: the hot-key guard caps
    members at ``max_bucket``, so one bucket row costs at most
    max_bucket²/2 in-place intersections — bounded single-task work by
    design, and typical buckets are tiny. At 100 TB the shuffle is
    8× the tokenized corpus; the join shape would be |pairs|-driven and
    unboundedly worse whenever pairs/doc exceeds NUM_BANDS/2.
    """
    if max_bucket is not None:
        from sydradb_spark.util import drop_hot_keys

        band_sigs = drop_hot_keys(band_sigs, ["band", "sig"], max_bucket)
    # r16 verify-side fusion: when the caller carried each doc's shingle
    # array ON the band rows (minhash_signatures_from_arrays(keep_arr=True)
    # + band_signatures(carry=("arr",))), the bands ⋈ arrays join is
    # unnecessary — the rows already hold exactly what the join attached
    # (doc_id is unique per arrays row, so inner-join-on-doc_id ≡ the
    # carried column, row for row). The hot-key guard's anti-join above
    # hash-partitions these rows by (band, sig), which the bucket collect
    # below reuses: the arr payload crosses ONE exchange, and no join
    # exists to mis-plan. The ``arrays`` argument remains for callers whose
    # bands come from storage without the array (minhash_query_index — the
    # on-disk band layout is unchanged).
    if "arr" in band_sigs.columns:
        members = band_sigs
    else:
        if arrays is None:
            raise ValueError(
                "bucket_verified_pairs: bands carry no 'arr' column and no "
                "arrays frame was supplied"
            )
        members = band_sigs.join(arrays, on="doc_id")
    buckets = (
        members.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "arr"))).alias("ms"))
        .where(F.size("ms") >= 2)
    )
    ms = F.col("ms")
    pair_structs = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + F.lit(2), F.size(ms)),
                lambda y: F.struct(
                    x["doc_id"].alias("a"),
                    y["doc_id"].alias("b"),
                    F.size(F.array_intersect(x["arr"], y["arr"])).alias("common"),
                    F.size(x["arr"]).alias("na"),
                    F.size(y["arr"]).alias("nb"),
                ),
            ),
        )
    )
    # threshold filter BEFORE the cross-band distinct (r16, guide §2.3/§2.4):
    # the jaccard is computable per expanded row (common/na/nb ride in the
    # struct), and a pair carries IDENTICAL counts from every bucket it
    # co-occurs in, so filter∘distinct = distinct∘filter — but the filter is
    # a map-side expression in the explode's codegen stage while the
    # distinct is a shuffle. At a 0.2+ threshold most bucket co-occurrences
    # fail, so the exchange carries only the passing pairs. The filter and
    # the output column use the same deterministic expression, so the pass
    # set and emitted values are bit-identical to the filter-after shape.
    jac = F.col("common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("common")
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a", "p.b", "p.common", "p.na", "p.nb")
        .where(jac >= F.lit(threshold))
        .distinct()
        .select("a", "b", jac.alias("jaccard"))
    )


def jaccard_for_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification pass).

    Common-shingle counting via two joins against the shingle table — no
    array materialization per pair, so wide docs don't blow up rows.

    Scale shape (round 9, found the hard way at sf100): the verify join
    must never SHUFFLE the corpus-side shingle table. The b-side join on
    (b, sh) plans as a shuffle join, and AQE can only convert it to
    broadcast AFTER the map stage materializes — so the full exploded
    table (~1.5B rows / ~90 GB of shuffle write at 5M docs) hit disk
    before any runtime re-plan could help; at sf100 that filled the
    sandbox disk outright. Candidate-filtering first — a broadcast
    semi-join on the distinct pair docs — bounds every downstream
    shuffle by |candidate docs| x shingles/doc, which the LSH hot-bucket
    guard already keeps small, and costs only the broadcast-build
    constant the round-8 A/B measured (~3 s/call at sf10, the reason it
    was originally rejected; the A/B never ran a decade where the
    unfiltered shape shuffle-writes 100x the input). ``pairs`` should be
    persisted by the caller so the distinct runs once; the explicit
    broadcast keeps the corpus side map-local.

    NOTE: this is the verify for an EXPLICIT externally-supplied pair
    set. The MinHash chain itself no longer goes through here — when the
    pairs come from LSH buckets, ``bucket_verified_pairs`` verifies them
    inside the buckets with a shuffle bounded by the corpus, not the
    candidate count (see its docstring for the sf100 measurement that
    forced the split).

    Jaccard here is STRING-exact (distinct shingle strings), while
    ``bucket_verified_pairs`` intersects 60-bit ``hash64`` shingle sets —
    on a hash collision within a pair's shingle union the two APIs can
    differ by one intersection count (P ≈ |union|²/2^61 per pair,
    negligible but real). Kept string-exact deliberately: this function's
    contract is ground-truth verification of arbitrary external pairs,
    where exactness beats consistency with the LSH fast path.
    """
    cand = (
        pairs.select(F.col("a").alias("doc_id"))
        .union(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh = sh.join(F.broadcast(cand), on="doc_id", how="semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    common = (
        pairs.join(sh.select(F.col("doc_id").alias("a"), "sh"), on="a")
        .join(sh.select(F.col("doc_id").alias("b"), "sh"), on=["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(common, on=["a", "b"], how="left")
        .na.fill({"common": 0})
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), on="a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), on="b")
        .select(
            "a",
            "b",
            (
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def lsh_tuning(
    threshold: float, num_hashes: int = NUM_HASHES
) -> tuple[int, int, float]:
    """(bands, rows, s_curve_midpoint) for a target Jaccard ``threshold``
    under a fixed signature budget — the standard MMDS S-curve analysis:
    candidate probability at similarity j is 1-(1-j^r)^b, with midpoint
    ≈ (1/b)^(1/r). Picks the (b, r) factorization of ``num_hashes`` whose
    midpoint sits closest below the target, so pairs AT the threshold are
    still likely candidates (recall-leaning; the exact-Jaccard verify
    step removes the extra false positives this admits). Use to re-derive
    NUM_BANDS/BAND_ROWS when a deployment needs a different operating
    point (e.g. 0.8-threshold web dedup wants r=4+ to cut candidate
    volume; the default 8x2 targets the aggressive 0.2-0.5 range)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for r in range(1, num_hashes + 1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        mid = (1.0 / b) ** (1.0 / r)
        # prefer the largest midpoint that stays at/below the target;
        # fall back to the overall-closest if none is below
        key = (mid <= threshold, -abs(mid - threshold))
        if best is None or key > best[0]:
            best = (key, b, r, mid)
    assert best is not None
    _, b, r, mid = best
    return b, r, mid


def minhash_near_dups(
    docs: DataFrame, threshold: float = 0.2, text_col: str = "text"
) -> DataFrame:
    """Near-duplicate pairs (a, b, jaccard ≥ threshold): shingle → MinHash →
    LSH band buckets → in-bucket exact-Jaccard verify. Never all-pairs.

    Scale shape history: the VERIFY moved twice — the r6-r8 exploded-join
    verify (``jaccard_for_pairs``) shuffle-writes |pairs| × shingles/doc
    rows, which the sf100 campaign measured at ~230 GB for a 560 MB corpus
    (100M candidates from r=2 banding) — fatal regardless of candidate
    filtering. Round 9 verifies inside the buckets instead
    (``bucket_verified_pairs``): the shuffle is NUM_BANDS × the tokenized
    corpus, independent of how many candidates banding admits. Round 16
    removed the chain's remaining joins and shuffles outright: signatures
    are computed DOC-LOCALLY from the shingle arrays in one Arrow kernel
    (``minhash_signatures_from_arrays`` — the r6→r15 exploded route's
    ~150× row multiplication and its corpus-keyed groupBy shuffle no
    longer exist), and each doc's array rides ON its band rows
    (``keep_arr``/``carry``), so the verify side needs no bands ⋈ arrays
    join — the hot-bucket guard's anti-join partitions the carried rows by
    (band, sig) and the bucket collect reuses that partitioning. Net plan:
    one map-only pass over the corpus, then exactly the exchanges the
    algorithm's s-curve requires (hot-key count, pair-dedup distinct).

    The lazy localCheckpoint materializes the (small) verified pair set
    once so multi-consumer callers (clustering fixpoint, curation) don't
    re-run the chain, and keeps the persist-hygiene contract (no plain
    persists to leak).
    """
    # ONE tokenize pass (r15, guide §2.4 "remove passes outright"), now
    # checkpointed AFTER the signature kernel (r16): the hot-bucket guard
    # consumes the band rows twice (count-aggregate + anti-join main side)
    # and there is no exchange between the kernel and those consumers, so
    # un-persisted the tokenize+kernel would run twice. The persisted frame
    # is (doc_id, arr, m0..m15) — the same doc-local bounded size class as
    # the r15 arrays checkpoint (~1/4 of the text bytes) plus 128 B/doc of
    # signature; what it buys is the corpus read + regex tokenize + kernel
    # pass. Only the cheap JVM band explode re-runs per consumer.
    sigs = minhash_signatures_from_arrays(
        shingle_arrays(docs, text_col), keep_arr=True
    ).localCheckpoint(eager=False)
    bands = band_signatures(sigs, carry=("arr",))
    out = bucket_verified_pairs(bands, None, threshold)
    # LAZY since r16 (r15 verdict #5): eager paid a dedicated
    # materialization job before any consumer ran; the persist under a
    # lazy checkpoint computes the chain inside the first consumer's
    # action instead (cluster_pairs probes the pair count immediately, so
    # multi-consumer callers still run the chain exactly once).
    return out.localCheckpoint(eager=False)


def minhash_write_index(docs: DataFrame, path: str, text_col: str = "text") -> None:
    """Materialize the MinHash/LSH near-dup index ONCE to parquet so
    repeated near-dup queries skip the tokenize+hash pass entirely —
    the build/query split that recovers r06's warm-call latency WITHOUT
    r06's cross-call cache leak (the r07 fix released the in-call cache
    and honestly re-paid the shingle pass per call; this makes the warm
    path a parquet re-read instead):

    - ``{path}/arrays`` — (doc_id, arr), each doc's distinct shingle set,
      the in-bucket exact-Jaccard verify input (round 9: replaced the
      exploded ``shingles`` table when the verify moved into the buckets —
      same information, ~rows/50 on disk)
    - ``{path}/bands`` — (doc_id, band, sig), the LSH candidate input

    Both tables are doc-local (each row derives from its own document
    alone, like BM25 postings), so append-only maintenance is EXACT:
    writing a new batch's index with mode='append' equals a full rebuild
    row for row (pinned in tests).

    A ``_INDEX_VERSION`` sidecar records the on-disk layout version
    (r10, advice item): round 9 changed ``arrays.arr`` from
    array<string> to array<long> with no marker, so mode='append'
    maintenance against a pre-change index would silently create a
    mixed-schema parquet directory. ``minhash_read_index`` fails fast on
    either a stale sidecar or a string-typed ``arr``."""
    # single-tokenize build (r15): tokenize once and derive BOTH tables
    # from the same frame — the signature chain consumes compact hash
    # arrays instead of re-tokenizing the whole corpus a second time (same
    # equivalence as minhash_near_dups' in-memory route). r16 (r15 advice):
    # the bands derive from the IN-MEMORY checkpointed frame, not a
    # read-back of the just-written parquet — the read-after-write added a
    # same-build listing dependency that delayed-visibility object stores
    # can violate, for no savings (the checkpoint holds the same hashes).
    arrays = shingle_arrays(docs, text_col).localCheckpoint(eager=False)
    arrays.write.mode("overwrite").parquet(f"{path}/arrays")
    # doc-local signature kernel (r16) — same route as minhash_near_dups
    band_signatures(minhash_signatures_from_arrays(arrays)).write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")
    with open(f"{path}/_INDEX_VERSION", "w") as fh:
        fh.write(f"{MINHASH_INDEX_VERSION}\n")


# On-disk layout version of minhash_write_index. 2 = hash64 shingle arrays
# (round 9); 1 = the unversioned round-8 string-shingle layout, detectable
# only by its arr element type.
MINHASH_INDEX_VERSION = 2


def minhash_read_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(arrays, bands) frames of a ``minhash_write_index`` layout.

    Fails fast (with rebuild guidance) on a pre-r9 index: a string-typed
    ``arr`` column, or an ``_INDEX_VERSION`` sidecar naming a different
    layout — appending the current hash64 rows to such a directory would
    make Spark read a mixed-schema table as one inferred schema (read
    failure or silent null arrays feeding bucket_verified_pairs)."""
    import os

    ver_file = f"{path}/_INDEX_VERSION"
    if os.path.exists(ver_file):
        with open(ver_file) as fh:
            ver = fh.read().strip()
        if ver != str(MINHASH_INDEX_VERSION):
            raise ValueError(
                f"minhash index at {path} has layout version {ver}, this "
                f"build reads version {MINHASH_INDEX_VERSION} — rebuild it "
                "with minhash_write_index"
            )
    arrays = spark.read.parquet(f"{path}/arrays")
    elem = arrays.schema["arr"].dataType.elementType.simpleString()
    if elem != "bigint":
        raise ValueError(
            f"minhash index at {path} stores {elem} shingles (pre-r9 "
            "string layout?) — this build intersects hash64 arrays; "
            "rebuild the index with minhash_write_index"
        )
    return arrays, spark.read.parquet(f"{path}/bands")


def minhash_query_index(
    arrays: DataFrame, bands: DataFrame, threshold: float = 0.2
) -> DataFrame:
    """Near-dup pairs (a, b, jaccard ≥ threshold) from a materialized
    index — the warm path of the build/query split. Same bucket-verified
    chain as ``minhash_near_dups``, but both inputs are columnar parquet
    re-reads (OS-page-cached on repeats), not recomputes of the
    tokenize+hash chain."""
    out = bucket_verified_pairs(bands, arrays, threshold)
    return out.localCheckpoint(eager=False)  # lazy: see minhash_near_dups


# --- SimHash ------------------------------------------------------------------
def simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 32-bit SimHash over distinct whitespace tokens.

    Bit i is the sign of Σ±1 over token-hash bit i. The tokenize+hash64
    pass stays a NARROW JVM map over the documents table (zero shuffle,
    one md5 per distinct token); the 32 per-bit signed sums run in ONE
    vectorized Arrow kernel (r16, guide §4.2). The previous shape folded
    each bit with an ``aggregate`` HOF whose lambda is INTERPRETED per
    element — 32 × tokens/doc lambda evaluations per doc was ~80% of the
    fingerprint pass (measured 1.45 s vs 0.24 s for tokenize+hash alone
    at sf0.1); the kernel replaces them with 32 vectorized popcount
    passes.

    EXACTNESS (why this is safe where the cosine HOF was not): the fold
    is pure int64 arithmetic — Σ±1 over bit i equals
    ``2·(count of elements with bit i set) − n``, both computed exactly
    in any order, and the bit test ``s > 0`` is an integer compare. Edge
    semantics replicated from the HOF form and pinned by test: a NULL
    token-hash element contributes −1 (its ``when`` falls to the
    otherwise branch) — the kernel zero-fills null slots, and a zero
    element has no bits set, i.e. contributes −1 to every bit, the same
    thing; an empty array gives every-bit s=0 → simhash 0; a NULL array
    gives NULL folds, so every ``when(s > 0, …)`` falls to 0 → simhash 0.
    hash64 values are 60-bit non-negative, so numpy's arithmetic ``>>``
    matches Spark's ``shiftright``.
    """
    th = _spread(docs).select(
        "doc_id",
        F.transform(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+")),
            lambda t: hash64(t),
        ).alias("__th"),
    )
    n_bits = SIMHASH_BITS
    id_t = th.schema["doc_id"].dataType.simpleString()
    out_schema = f"doc_id {id_t}, simhash long"

    def kern(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            col = batch.column(1)
            n = len(col)
            # raw child + raw offsets: aligned by Arrow's layout even for
            # sliced batches or null list slots (see with_sign_bucket_norm)
            flat = col.values
            if flat.null_count:
                flat = pc.fill_null(flat, 0)  # NULL element ≡ −1/bit, like the HOF
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            base = int(offs[0])
            lo = offs[:-1] - base
            hi = offs[1:] - base
            lens = hi - lo
            row_null = col.is_null().to_numpy(zero_copy_only=False)
            sim = np.zeros(n, dtype=np.int64)
            vals = flat.to_numpy(zero_copy_only=False)[base : int(offs[-1])]
            if n and len(vals):
                # per-row set-bit counts via prefix sums (no reduceat
                # empty-segment quirks); counts for empty rows are 0
                c = np.empty(len(vals) + 1, dtype=np.int64)
                c[0] = 0
                for i in range(n_bits):
                    np.cumsum((vals >> i) & 1, out=c[1:])
                    counts = c[hi] - c[lo]
                    sim |= ((2 * counts > lens).astype(np.int64)) << i
            if row_null.any():
                sim[row_null] = 0  # NULL array → every when() falls to 0
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(sim, type=pa.int64())],
                names=[batch.schema.names[0], "simhash"],
            )

    return th.mapInArrow(kern, out_schema)


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """(a, b, hamming ≤ max_hamming) via banded join: 4 bands × 8 bits, so any
    pair within Hamming 3 shares an exact band (pigeonhole) — identical output
    to the O(n²) scan without forming all pairs.

    ``max_bucket`` (opt-in) bounds the Σ bucket² self-join cost at corpus
    scale via ``drop_hot_keys``: a band value shared by millions of docs
    (boilerplate collapsing to one fingerprint) would otherwise dominate the
    join. TRADE-OFF, stated plainly: dropping a hot band-bucket loses any
    pair whose ONLY shared band was the hot one, so the pigeonhole
    exactness guarantee holds only for the default ``None``. At scale the
    hot buckets ARE the exact-dup mass a cheaper md5 pass should have
    removed first — run ``exact_dedup`` upstream and the guard only drops
    residual boilerplate.

    ``sigs`` (r15): pass a precomputed ``simhash(docs)`` frame to skip the
    tokenize+fingerprint pass — for callers that also need the signatures
    themselves (the merged near_dup_scores entry computes them once and
    feeds both its ``sig`` part and this banded join)."""
    assert max_hamming < SIMHASH_BANDS, "banding only guarantees hamming < #bands"
    # The static plan shows this subtree 4x (self-join sides x hot-bucket
    # guard), but every copy sits below canonically identical Exchanges
    # that AQE's runtime stage reuse computes once — an explicit
    # checkpoint A/B'd as a wash at best (r15, OPTIMIZATION_r15.md).
    # Callers that ALSO need the signatures themselves pass ``sigs``.
    sh = sigs if sigs is not None else simhash(docs)
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "simhash",
        "band",
        F.expr(f"(simhash >> (band * {band_width})) & {(1 << band_width) - 1}").alias(
            "bandval"
        ),
    )
    if max_bucket is not None:
        from sydradb_spark.util import drop_hot_keys

        banded = drop_hot_keys(banded, ["band", "bandval"], max_bucket)
    left = banded.select("band", "bandval", F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    right = banded.select("band", "bandval", F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    # hamming filter BEFORE the pair-dedup distinct (r16, guide §2.3/§2.4):
    # bit_count(xor) is a free map-side expression, while the distinct is a
    # full shuffle of the banded join's output — at sf0.1 the join emits
    # 8.9M candidate rows of (a, b, ha, hb) but only ~0.7M distinct pairs
    # pass hamming ≤ 3. Filtering first shrinks the distinct's exchange to
    # the passing pairs (≤ #bands rows each) and narrows the payload to
    # (a, b, hamming). Equivalent output: each doc has exactly one simhash,
    # so hamming is a function of (a, b) and filter∘distinct = distinct∘filter.
    return (
        left.join(right, on=["band", "bandval"])
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --- embedding-cosine near-dup -------------------------------------------------
def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    emb_col: str = "embedding",
    max_bucket: int | None = None,
    planes: list[list[int]] | None = None,
) -> DataFrame:
    """(a, b, cosine ≥ threshold) near-duplicate pairs by embedding similarity.

    Candidates come from a sign-LSH bucket self-join (same deterministic
    bucket as pipeline.similarity) — near-identical embeddings share all sign
    bits, so high-threshold dedup loses little recall while the join cost is
    Σ bucket², never n². Verification computes exact cosine on candidates.
    ``max_bucket`` (opt-in) drops degenerate sign-buckets at corpus scale —
    same trade-off as ``simhash_near_pairs``: pairs living only in a dropped
    bucket are lost, so the default keeps full recall.

    ``planes`` defaults to hyperplanes sized to the CORPUS dim (probed from
    one row), so a 768-dim corpus projects on all 768 dims instead of
    silently bucketing on the default 64-dim prefix; pass explicit planes
    to pin a geometry (e.g. to match a stored index or a DuckDB twin).
    """
    from sydradb_spark.pipeline.similarity import (
        _norm,
        cosine_prenormed,
        hyperplanes,
        sign_bucket,
    )

    if planes is None:
        # null-safe early-exit probe: first row with a non-empty embedding
        # (a bare .first() could hit a NULL row and silently fall back to
        # the 64-dim default — the prefix-bucketing bug again; a max over
        # ALL rows' sizes would be deterministic but pays a full corpus
        # scan, and on a mixed-dim corpus max-sized planes are wrong for
        # the shorter vectors anyway — mixed dims need explicit planes)
        probe = (
            emb.where(F.size(F.col(emb_col)) > 0)
            .select(F.size(F.col(emb_col)).alias("d"))
            .first()
        )
        if probe is not None and probe["d"] is not None and probe["d"] > 0:
            planes = hyperplanes(dim=int(probe["d"]))
    # bucket + hoisted norm (round 9) via the vectorized Arrow kernel (r16,
    # guide §4.2): bit-for-bit equal to the sign_bucket/_norm HOF folds —
    # see similarity.with_sign_bucket_norm for the cumsum argument — and
    # removes the per-row interpreted fold cost from the corpus-wide pass.
    from sydradb_spark.pipeline.similarity import with_sign_bucket_norm

    tagged = with_sign_bucket_norm(
        emb.select(F.col("vec_id"), F.col(emb_col).alias("__e")),
        "__e",
        "bucket",
        "__n",
        planes,
    )
    # The static plan shows this projection 4x (self-join sides x
    # hot-bucket guard), but all four copies sit below canonically
    # identical bucket-keyed Exchanges that AQE's runtime stage reuse
    # computes once — explicit checkpoints here A/B'd as a wash while
    # adding a corpus-sized cache copy (r15, OPTIMIZATION_r15.md).
    if max_bucket is not None:
        from sydradb_spark.util import drop_hot_keys

        tagged = drop_hot_keys(tagged, ["bucket"], max_bucket)
    left = tagged.select(
        "bucket",
        F.col("vec_id").alias("a"),
        F.col("__e").alias("__ea"),
        F.col("__n").alias("__na"),
    )
    right = tagged.select(
        "bucket",
        F.col("vec_id").alias("b"),
        F.col("__e").alias("__eb"),
        F.col("__n").alias("__nb"),
    )
    return (
        left.join(right, on="bucket")
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            cosine_prenormed(
                F.col("__ea"), F.col("__eb"), F.col("__na"), F.col("__nb")
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# --- exact n-gram Jaccard (brute, for small candidate universes) -------------
def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All-pairs exact 3-gram Jaccard — O(n²); only for bounded subsets
    (the scale path is minhash_near_dups).

    Intersects the 60-bit ``hash64`` shingle sets instead of the string
    sets (r15, guide §2.3 narrower types): 8-byte elements cut the
    per-pair ``array_intersect`` cost and the crossJoin payload several
    times over ~25-byte shingle strings. Exact by construction, not by
    probability: the DuckDB twin intersects the SAME md5-based hash64
    values, so a (astronomically rare, ~|shingles|²/2^61) collision merges
    two elements identically in BOTH engines' sets — the round-9
    ``bucket_verified_pairs`` argument, applied to the all-pairs utility."""
    withsh = shingle_arrays(docs, text_col).select("doc_id", F.col("arr").alias("shs"))
    a = withsh.select(F.col("doc_id").alias("a"), F.col("shs").alias("sa"))
    b = withsh.select(F.col("doc_id").alias("b"), F.col("shs").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.when(union > 0, inter.cast("double") / union).otherwise(0.0).alias(
                "jaccard"
            ),
        )
    )


# --- near-dup clustering (connected components) -------------------------------
def _large_star(sym: DataFrame) -> DataFrame:
    """One LARGE-STAR round (Kiveris et al.): ``sym`` is the symmetric edge
    list (both directions present, no self-loops). Every node u computes its
    neighborhood minimum m = min(N(u) ∪ {u}) and re-points each LARGER
    neighbor v > u at m. The min is a map-side-combining groupBy — the hot
    node of a viral star contributes one partial row per map task, never a
    neighbor array — and the join attaches one m per edge row, streaming
    through a spillable (AQE-skew-splittable) shuffle."""
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    return (
        sym.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One SMALL-STAR round: over canonical larger→smaller edges, every
    node u re-points its smaller neighbors (and itself) at the minimum of
    that smaller neighborhood. Same skew-safe shape as ``_large_star``.
    Output is canonical (u > v) by construction."""
    d = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    return (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def cluster_pairs(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs → (doc_id, cluster_id),
    cluster_id = min doc id in the component. The canonical-keeper step a
    training-data dedup pipeline runs after pair generation: keep cluster_id,
    drop the rest.

    Hybrid strategy (the shape every production CC uses): near-dup edge sets
    are SMALL relative to the corpus — candidate generation already bounded
    them — so up to ``driver_threshold`` edges a driver-side union-find
    answers the common case. The size probe is persist → count → collect:
    the persist makes the (expensive) LSH-candidate + exact-Jaccard-verify
    chain materialize exactly once in one fully-parallel pass, the count
    reads the cached result, and the collect fetches it only when it fits
    the driver budget. (A ``limit(threshold+1).collect()`` probe — the
    previous shape — re-ran the upstream in Spark's incremental
    scale-up-limit passes: measured 2x the whole cold verify phase at
    sf0.1.) Beyond the threshold, alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond"): each round re-points edges at per-node neighborhood minima
    via a map-side-combining ``groupBy().min()`` plus one join — there is
    NO per-node neighbor-list collect anywhere, so one viral boilerplate
    component (a 100k-edge star) never materializes as a single task's
    in-memory array; the hot node's edges stream through a spillable join
    whose skewed partition AQE splits (skewJoin is on in the session).
    Converges in O(log n) rounds regardless of component diameter (the
    r06 min-label loop needed diameter rounds on chains),
    ``localCheckpoint`` every round keeping lineage flat. Both paths
    produce identical (doc_id, component-min) labels. Singletons (docs
    with no pair) are not emitted — their cluster is themselves by
    definition.
    """
    from pyspark import StorageLevel
    from pyspark.sql.types import StructField, StructType

    spark = pairs.sparkSession
    # labels carry the pair id type (long doc ids, string keys, ...) — the
    # union-find path must not silently assume numeric ids
    id_type = pairs.schema[a_col].dataType
    out_schema = StructType(
        [
            StructField("doc_id", id_type, True),
            StructField("cluster_id", id_type, True),
        ]
    )
    slim = pairs.select(a_col, b_col).persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = slim.count()
    if n_pairs == 0:
        slim.unpersist()
        return spark.createDataFrame([], out_schema)
    if n_pairs <= driver_threshold:
        probe = slim.collect()
        slim.unpersist()
        parent: dict = {}  # id -> parent id, any orderable type

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        nodes: set = set()
        for r in probe:
            nodes.add(r[0])
            nodes.add(r[1])
            ra, rb = find(r[0]), find(r[1])
            if ra != rb:
                # union by MIN so the root IS the component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        rows = [(x, find(x)) for x in sorted(nodes)]
        return spark.createDataFrame(rows, out_schema)
    # nodes appearing ONLY in self-pairs still owe a (x, x) label row —
    # capture them while the pair frame is still cached (they never enter
    # the star rounds, which drop self-loops)
    selfs = (
        slim.where(F.col(a_col) == F.col(b_col))
        .select(F.col(a_col).alias("doc_id"))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        slim.select(
            F.greatest(a_col, b_col).alias("u"), F.least(a_col, b_col).alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    slim.unpersist()

    def _sig(f: DataFrame) -> tuple:
        # order-free (count, content-hash-sum) screen in ONE aggregate
        return tuple(
            f.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash("u", "v").cast("long")).alias("h"),
            ).collect()[0]
        )

    sig_old = _sig(edges)
    for _round in range(64):  # paper-guaranteed convergence; cap = bug guard
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        new = _small_star(_large_star(sym)).localCheckpoint()
        # fixpoint test, two tiers: the cheap signature screens every round
        # (sig_old carried from the previous round's sig_new — one aggregate
        # per round, not two); a signature MATCH is then confirmed with an
        # exact set comparison, because equal (count, hash-sum) alone is not
        # sound — two swapped edges whose 32-bit hashes sum equal would
        # otherwise terminate the loop on a non-star edge set and hand out
        # silently wrong cluster labels. The exact check runs only at the
        # candidate fixpoint (a collision just continues the loop), so the
        # soundness costs one extra join-shaped job per cluster_pairs call.
        sig_new = _sig(new)
        if sig_new == sig_old and new.exceptAll(edges).isEmpty():
            # converged: disjoint stars rooted at each component's min
            leaves = new.select(
                F.col("u").alias("doc_id"), F.col("v").alias("cluster_id")
            )
            roots = (
                new.select(F.col("v").alias("doc_id"))
                .distinct()
                .select("doc_id", F.col("doc_id").alias("cluster_id"))
            )
            out = leaves.union(roots)
            lone_selfs = selfs.join(
                out.select("doc_id"), on="doc_id", how="left_anti"
            ).select("doc_id", F.col("doc_id").alias("cluster_id"))
            return out.union(lone_selfs)
        edges = new
        sig_old = sig_new
    raise RuntimeError("cluster_pairs: star rounds failed to converge")


def minhash_near_dup_clusters(
    docs: DataFrame, threshold: float = 0.2, text_col: str = "text"
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a non-trivial near-dup component
    (MinHash-LSH pairs at ``threshold`` → connected components)."""
    return cluster_pairs(minhash_near_dups(docs, threshold, text_col))


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.5,
    text_col: str = "text",
    benchmark: DataFrame | None = None,
    redact: bool = False,
    boilerplate_max_docs: int | None = None,
    lm: DataFrame | None = None,
    lm_min_logprob: float | None = None,
) -> DataFrame:
    """End-to-end corpus curation — the canonical training-data pipeline,
    one composition: [boilerplate-line removal] → quality gate → exact
    dedup → near-dup collapse, with optional benchmark decontamination and
    PII redaction stages.

    0. (``boilerplate_max_docs`` given) C4-style global line dedup runs
       FIRST — cleaning before dedup, so boilerplate can't mask real
       near-dups or prop up quality scores;
    1. score + filter: `text.quality_score` (pure column expressions) drops
       documents under ``min_quality``;
    2. exact dedup: one combining shuffle on the content md5, deterministic
       min-doc_id keeper;
    3. near-dup collapse: MinHash-LSH pairs at ``near_dup_threshold`` →
       connected components → keep each component's min doc_id;
    1b. (``lm`` + ``lm_min_logprob`` given) perplexity-bucket gate: drop
       docs whose `text.lm_score_docs` mean bigram log-prob under the
       supplied model falls below the threshold (gibberish/SEO spam that
       the closed-form quality score misses); docs too short to score
       (NULL) are kept — no evidence either way;
    4. (``benchmark`` given) decontamination: drop survivors sharing a word
       n-gram with the benchmark corpus (broadcast n-gram set, anti-join);
    5. (``redact=True``) PII redaction: rewrite ``text_col`` through
       `curation.redact_pii` (pure JVM regex; the LAST stage, so dedup
       keys and quality scores reflect the original text).

    Returns the SURVIVING docs with their quality score; a ``dropped``
    lineage frame is intentionally not materialized — at 100 TB the keep
    set is the product; audit trails come from re-running the stages, all
    of which are deterministic. Stage order matters for cost: the quality
    gate is the cheapest filter and runs first so dedup never shuffles
    rejected docs; near-dup (the only multi-shuffle stage) sees the
    smallest surviving set; decontamination scans only survivors.
    """
    # Arrow scoring kernel (r11): bit-identical to text.quality_score's
    # expression form, minus the interpreted-HOF allocation pressure that
    # was 52 s of the 5M-doc profile — the gate stays the cheapest stage.
    from sydradb_spark.pipeline.text import quality_score_arrow

    # spread() up front (no-op at scale where the source has enough
    # splits): without it the quality gate and the exact-dedup md5 scan
    # run at the input file's split count — the r9 stage profile measured
    # them at 2-way parallelism on a single sf1 parquet (4.6 s + 7.4 s of
    # the 18.5 s composition) while every downstream stage ran 32-wide.
    docs = _spread(docs)
    if boilerplate_max_docs is not None:
        from sydradb_spark.pipeline.curation import remove_boilerplate_lines

        other_cols = [c for c in docs.columns if c not in ("doc_id", text_col)]
        cleaned = remove_boilerplate_lines(docs, boilerplate_max_docs, text_col)
        docs = docs.select("doc_id", *other_cols).join(
            cleaned.select("doc_id", text_col), on="doc_id"
        )
    scored = docs.withColumn("quality", quality_score_arrow(F.col(text_col)))
    kept = scored.where(F.col("quality") >= min_quality)
    if lm is not None and lm_min_logprob is not None:
        from sydradb_spark.pipeline.text import lm_score_docs

        lp = lm_score_docs(kept, lm, text_col=text_col).where(
            F.col("avg_logprob").isNotNull()
            & (F.col("avg_logprob") < lm_min_logprob)
        )
        kept = kept.join(lp.select("doc_id"), on="doc_id", how="anti")
    # deduped feeds the near-dup stage (shingles + verify) AND the final
    # anti-join — materialize so the quality+dedup chain runs once (A/B at
    # sf0.1: 3.5 s vs 4.0 s median for the whole composition). A
    # localCheckpoint rather than persist: the near-dup stage inside this
    # call triggers actions anyway, and checkpoint blocks are released when
    # the caller drops the returned frame — a plain persist here is never
    # unpersisted (the anti-join below is evaluated by the CALLER, after
    # this function returns), so repeated calls would each pin a
    # survivors-sized cache for the session's lifetime: the exact
    # cross-call leak class the r07 minhash fix removed.
    # LAZY since r16 (r15 verdict #5, one barrier instead of two): eager
    # ran the quality+dedup chain as its own up-front job and THEN the
    # near-dup chain as another; lazy folds the materialization into the
    # near-dup stage's first action (cluster_pairs' size-probe count),
    # which computes and caches this frame on the way — every later
    # consumer (the pair chain's remaining actions, the caller's
    # anti-join) reads the same persisted blocks either way.
    deduped = exact_dedup(kept, text_col).localCheckpoint(eager=False)
    clusters = cluster_pairs(
        minhash_near_dups(deduped, near_dup_threshold, text_col)
    )
    # each near-dup component keeps its min doc_id; docs in no component
    # (cluster frame only holds non-trivial components) survive untouched
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    out = deduped.join(losers, on="doc_id", how="anti")
    if benchmark is not None:
        from sydradb_spark.pipeline.curation import decontaminate

        out = decontaminate(out, benchmark, text_col)
    if redact:
        from sydradb_spark.pipeline.curation import redact_pii

        out = out.withColumn(text_col, redact_pii(F.col(text_col))["redacted"])
    return out


# --- semantic dedup (SemDeDup) --------------------------------------------------
def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_n: int = 4096,
    max_cluster: int = 100_000,
    target_cluster_size: int = 8192,
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication", arXiv:2303.09540): k-means-partition the
    embedding space, find within-cluster pairs with cosine ≥ ``threshold``,
    and keep ONE representative per connected near-dup group — the member
    FARTHEST from its cluster centroid (the paper's low-centroid-similarity
    keeper: boundary examples carry more training signal than prototypical
    ones), ties broken by min id.

    Returns every input id with its verdict:
    (id_col, cluster, group_id, centroid_d2, keep, bypassed) — group_id is
    the component-min id (own id for singletons), ``keep`` marks the
    survivor, and ``bypassed`` marks rows whose cluster exceeded
    ``max_cluster`` and therefore SKIPPED dedup entirely (kept verbatim).
    Filter ``keep`` to materialize the deduped corpus; ``sum(bypassed)``
    (also logged per call) is the operator's no-op detector — a silent
    version of this bypass let the pre-r10 default geometry quietly keep
    a whole large corpus (r9 verdict finding 1).

    ``n_clusters`` defaults to corpus-size-aware geometry:
    ``ceil(count / target_cluster_size)`` clamped to [8, sample_n // 8] —
    within-cluster pair volume stays ~n * target_cluster_size / 2 (linear
    in n) instead of quadratic-at-fixed-k. Pass an explicit ``n_clusters``
    to pin geometry (the driver-contract entry pins k=8 for oracle
    determinism). If the clamp ceiling makes clusters outgrow
    ``max_cluster`` anyway (corpus > ~sample_n/8 * max_cluster), the
    bypass column/log says so — raise ``sample_n`` and ``n_clusters``.

    Scale shape: centroids train on a deterministic driver-side sample
    (FAISS-style — quantizer sample size is scale-free) and ride into the
    plan as LITERALS, so assignment is a narrow map with no centroid table
    and no join. Candidate pairs come from a within-cluster self-join whose
    per-key size is bounded by the hot-cluster bypass — an oversized
    cluster (quantizer too coarse for the corpus) never materializes a
    quadratic join. The hot-cluster frame is ≤ n_clusters rows by
    construction, so a broadcast anti-join is safe here (unlike the
    general ``drop_hot_keys`` shape, whose hot frame can be huge); one
    count aggregate feeds the bypass filter, the output column, and the
    log. Groups come from the shared ``cluster_pairs`` CC; the keeper
    choice is one max_by aggregate per group. Never all-pairs across
    clusters.
    """
    from sydradb_spark.pipeline.similarity import (
        _norm,
        centroid_d2s,
        cosine_prenormed,
        kmeans_fit_sample,
    )

    from pyspark import StorageLevel

    if n_clusters is None:
        # one metadata-cheap count action; clamp floor keeps tiny corpora
        # from degenerating to k=1 (no partitioning at all) and the ceiling
        # keeps Lloyd's sample-per-centroid ratio ≥ 8
        n = emb.count()
        n_clusters = max(8, min(max(sample_n // 8, 8), -(-n // target_cluster_size)))
    sample = [
        list(r[0])
        for r in emb.select(F.col(emb_col).cast("array<double>"))
        .orderBy(F.col(id_col))
        .limit(sample_n)
        .collect()
    ]
    n_clusters = min(n_clusters, max(1, len(sample)))
    cents = kmeans_fit_sample(sample, k=n_clusters)
    d2s = centroid_d2s(F.col(emb_col), cents)
    # tagged (a full-corpus centroid-distance projection) feeds BOTH sides
    # of the pair self-join AND the labeled join — persist so the distance
    # scan runs once, released below after the eager checkpoint (the same
    # persist-hygiene pattern as minhash_near_dups)
    tagged = emb.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("__e"),
        d2s.alias("__d2s"),
    ).select(
        "id",
        "__e",
        (F.array_position(F.col("__d2s"), F.array_min("__d2s")) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min("__d2s").alias("centroid_d2"),
        # hoisted norm (round 9, similarity.cosine_prenormed): folded once
        # per vector inside the persisted projection, so the within-cluster
        # pair join never re-folds it per pair
        _norm(F.col("__e")).alias("__n"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # hot-cluster bypass, OBSERVABLE (r9 verdict finding 1): one count
    # aggregate over the persisted projection yields the ≤ n_clusters-row
    # hot frame; it is materialized for the log, broadcast-anti-joined to
    # bound the pair join, and broadcast-left-joined back so every output
    # row carries its bypass verdict.
    hot = (
        tagged.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_cluster)
    )
    hot_rows = hot.collect()
    if hot_rows:
        _LOG.warning(
            "semantic_dedup: %d/%d clusters over max_cluster=%d bypassed "
            "dedup (%d members kept verbatim) — raise n_clusters/sample_n",
            len(hot_rows),
            n_clusters,
            max_cluster,
            sum(r["__n"] for r in hot_rows),
        )
    if hot_rows:
        is_hot = F.array_contains(
            F.array(*[F.lit(int(r["cluster"])) for r in hot_rows]), F.col("cluster")
        )
    else:
        is_hot = F.lit(False)
    cand = tagged.where(~is_hot)
    left = cand.select(
        "cluster",
        F.col("id").alias("a"),
        F.col("__e").alias("__ea"),
        F.col("__n").alias("__na"),
    )
    right = cand.select(
        "cluster",
        F.col("id").alias("b"),
        F.col("__e").alias("__eb"),
        F.col("__n").alias("__nb"),
    )
    pairs = (
        left.join(right, on="cluster")
        .where(F.col("a") < F.col("b"))
        .where(
            cosine_prenormed(
                F.col("__ea"), F.col("__eb"), F.col("__na"), F.col("__nb")
            )
            >= threshold
        )
        .select("a", "b")
    )
    groups = cluster_pairs(pairs)  # (doc_id, cluster_id = component min)
    labeled = tagged.join(
        groups.select(F.col("doc_id").alias("id"), F.col("cluster_id").alias("__g")),
        on="id",
        how="left",
    ).select(
        "id",
        "cluster",
        F.coalesce(F.col("__g"), F.col("id")).alias("group_id"),
        "centroid_d2",
        is_hot.alias("bypassed"),
    )
    # keeper per group: max centroid_d2, ties -> min id. min of
    # (-centroid_d2, id) struct order gives exactly that for ANY orderable
    # id type (negating the always-numeric distance, never the id — the
    # pre-r08 (-id) trick silently required a numeric id column)
    keepers = labeled.groupBy("group_id").agg(
        F.min(
            F.struct((-F.col("centroid_d2")).alias("__nd2"), F.col("id"))
        ).alias("__k")
    )
    out = (
        labeled.join(keepers, on="group_id")
        .select(
            F.col("id").alias(id_col),
            "cluster",
            "group_id",
            "centroid_d2",
            (
                (F.col("centroid_d2") == -F.col("__k.__nd2"))
                & (F.col("id") == F.col("__k.id"))
            ).alias("keep"),
            "bypassed",
        )
    )
    # materialize the (narrow: id + verdict columns, no embeddings) result
    # eagerly so the corpus-sized tagged cache can be released in-call
    out = out.localCheckpoint(eager=True)
    tagged.unpersist()
    return out
