"""Driver-contract entries for the LLM-data-pipeline operators, over the
documents/embeddings tables.

Every oracle mirrors the Spark algorithm step by step (same md5-based hash
family, same banding, same tie-breaks) — these are deterministic algorithms,
so approximate operators (LSH) are still exactly checkable.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sydradb_spark.contract.base import r6_col, rq_close, rq_open

# SQL halves of the 9dp-then-6dp stabilizer, for oracle f-strings whose
# stabilized expression can't nest inside a Python 3.11 f-string field
# (quotes/backslashes). Single source of truth lives in contract.base.
_O = rq_open()
_C = rq_close(6)
from sydradb_spark.pipeline import dedup, multimodal, similarity, text
from sydradb_spark.tables import load_table

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def _q(name: str, fn, sql) -> None:  # sql: str | zero-arg callable | None
    QUERIES[name] = fn
    if sql is not None:
        ORACLES[name] = sql


def _r6(c):
    return r6_col(c)


# Shared oracle fragments ------------------------------------------------------
_TOKS = (
    "toks AS (SELECT doc_id, text, CASE WHEN length(trim(text)) = 0 THEN [] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents)"
)
_SHINGLES = (
    "sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh "
    "FROM toks, unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS u(i))"
)
_HASH = "('0x' || substr(md5({0}), 1, 15))::BIGINT"


# --- text analysis ------------------------------------------------------------
def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sydradb_spark.util import spread

    # Signal history: r6 fused quality+repetition into one projection, r9
    # replaced the per-doc quadratic bigram count with the sort+run fold,
    # r10 layered the projection tokenize-once (5 transient arrays/row
    # instead of ~11 — the sf100 GC term). r11 fuses the WHOLE battery
    # into ONE Arrow pass per doc (text.text_stats_arrow): C-backed
    # Python, zero JVM array churn — 178 s → 69.6 s at the 5M-doc twin
    # (same session, medians of 3), below the sf10-linear estimate,
    # bit-identical to the expression battery (which remains in text.py
    # as the oracle-identical verifier, pinned equal by
    # test_text_stats_arrow_bit_identical). Still map-only, zero shuffles.
    docs = spread(load_table(spark, sf_dir, "documents"))
    s = text.text_stats_arrow(docs)
    return s.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_tokens_bpe",
        _r6(F.col("distinct_ratio")).alias("distinct_ratio"),
        _r6(F.col("mean_word_len")).alias("mean_word_len"),
        _r6(F.col("space_ratio")).alias("space_ratio"),
        _r6(F.col("punct_ratio")).alias("punct_ratio"),
        "n_lines",
        _r6(F.col("dup_line_ratio")).alias("dup_line_ratio"),
        _r6(F.col("top_bigram_ratio")).alias("top_bigram_ratio"),
    )


# DuckDB's RE2 has no lookarounds, so the BPE-ish split count is mirrored
# positionally: pieces = whitespace tokens + letter<->digit adjacencies.
_BPE_TRANSITIONS = (
    "list_sum([CASE WHEN "
    "(lower(t[i]) BETWEEN 'a' AND 'z' AND t[i+1] BETWEEN '0' AND '9') OR "
    "(t[i] BETWEEN '0' AND '9' AND lower(t[i+1]) BETWEEN 'a' AND 'z') "
    "THEN 1 ELSE 0 END for i in generate_series(1, greatest(length(t) - 1, 0))])"
)


_q(
    "text_stats",
    _text_stats,
    f"""WITH {_TOKS}, bt AS (SELECT doc_id, trim(text) AS t FROM documents),
bpe AS (SELECT doc_id, coalesce({_BPE_TRANSITIONS}, 0) AS transitions FROM bt),
rep AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                     l -> length(l) > 0) AS ls,
         CASE WHEN len(tk) >= 2
              THEN [tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk) - 1)]
              ELSE [] END AS bg
  FROM toks
),
-- top bigram count via unnest + GROUP BY: the former per-doc
-- list_transform(list_distinct(bg), d -> len(list_filter(bg, ...))) is
-- O(distinct_bigrams x bigrams) PER DOC — quadratic in doc length, and
-- the dominant cost of this oracle on the skew twin's boilerplate family
bgc AS (
  SELECT doc_id, b, count(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS b FROM rep) GROUP BY 1, 2
),
bgm AS (SELECT doc_id, max(c) AS maxc, sum(c) AS nbg FROM bgc GROUP BY 1),
rep2 AS (
  SELECT rep.doc_id,
         CAST(len(ls) AS BIGINT) AS n_lines,
         CASE WHEN len(ls) > 1
              THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
              ELSE 0.0 END AS dup_line_ratio,
         CASE WHEN coalesce(bgm.nbg, 0) > 0
              THEN CAST(bgm.maxc AS DOUBLE) / bgm.nbg
              ELSE 0.0 END AS top_bigram_ratio
  FROM rep LEFT JOIN bgm ON bgm.doc_id = rep.doc_id
)
SELECT toks.doc_id AS doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(tk) AS BIGINT) AS n_tokens,
  CAST(len(tk) + bpe.transitions AS BIGINT) AS n_tokens_bpe,
  {_O}CASE WHEN len(tk) > 0 THEN CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) ELSE 0.0 END{_C} AS distinct_ratio,
  {_O}CASE WHEN len(tk) > 0 THEN CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk) ELSE 0.0 END{_C} AS mean_word_len,
  {_O}CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END{_C} AS space_ratio,
  {_O}CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()\\[\\]{{}}-]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END{_C} AS punct_ratio,
  rep2.n_lines AS n_lines,
  {_O}rep2.dup_line_ratio{_C} AS dup_line_ratio,
  {_O}rep2.top_bigram_ratio{_C} AS top_bigram_ratio
FROM toks
JOIN rep2 ON rep2.doc_id = toks.doc_id
JOIN bpe ON bpe.doc_id = toks.doc_id""",
)


# BPE oracle geometry (r12 rotation, VERDICT r11 item 5): a bounded
# deterministic sub-corpus (first _BPE_DOCS docs by doc_id, text cleaned to
# lowercase letters) trains _BPE_MERGES classic-BPE merges; DuckDB replays
# the greedy trainer with one unrolled CTE pair per round — words encoded as
# '(sym)(sym)...' strings, where a single left-to-right replace() of
# '(l)(r)'→'(lr)' is EXACTLY the leftmost-nonoverlapping merge rewrite
# (adjacent matches share no characters, unlike bare delimiters).
_BPE_DOCS = 40
_BPE_MERGES = 10
_BPE_CLEAN_RE = "[^A-Za-z ]+"


def _text_lang_quality_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID (stopword-hit heuristic), quality score, and document
    fingerprint — the three per-doc classifier columns in one pass, plus
    (r12 rotation) the BPE trainer/encoder surface:

    - ``doc``: per-doc lang/quality/fingerprint classifiers;
    - ``bpe``: the ordered merge table bpe_train_local produces on the
      bounded sub-corpus (doc_id=rank, lang_guess=left, fp=right) — the
      oracle replays the greedy trainer round by round;
    - ``enc``: per-doc token count after bpe_encode with those merges
      (count in hits_en) — encoding applies the merges in training order,
      so the oracle derives it from the replayed final word forms."""
    from sydradb_spark.pipeline import bpe

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    # tokenize-once: lang-ID alone is LANGS+1 token-array consumers and the
    # quality score three more — materialize the split in a parent
    # projection (see text.quality_columns)
    pre = docs.select("doc_id", t.alias("__t"), text.tokens(t).alias("__toks"))
    tt, toks = F.col("__t"), F.col("__toks")
    doc_part = pre.select(
        F.lit("doc").alias("part"),
        "doc_id",
        *[
            text.stopword_hits(tt, lang, toks).cast("long").alias(f"hits_{lang}")
            for lang in text.LANGS
        ],
        text.guess_lang(tt, toks).alias("lang_guess"),
        _r6(text.quality_score(tt, toks)).alias("quality"),
        text.fingerprint(tt).alias("fp"),
    )

    cleaned = (
        docs.orderBy("doc_id")
        .limit(_BPE_DOCS)
        .select(
            "doc_id",
            F.lower(F.regexp_replace(t, _BPE_CLEAN_RE, " ")).alias("text"),
        )
    )
    merges = bpe.bpe_train_local(cleaned, _BPE_MERGES)
    lnull = F.lit(None).cast("long")
    snull = F.lit(None).cast("string")
    dnull = F.lit(None).cast("double")
    pad = {f"hits_{lang}": lnull for lang in text.LANGS}
    merge_part = spark.createDataFrame(
        [(i, le, ri) for i, (le, ri) in enumerate(merges)],
        "rank long, le string, ri string",
    ).select(
        F.lit("bpe").alias("part"),
        F.col("rank").alias("doc_id"),
        *[pad[f"hits_{lang}"].alias(f"hits_{lang}") for lang in text.LANGS],
        F.col("le").alias("lang_guess"),
        dnull.alias("quality"),
        F.col("ri").alias("fp"),
    )
    hits_cols = [f"hits_{lang}" for lang in text.LANGS]
    enc_part = bpe.bpe_encode(cleaned, merges).select(
        F.lit("enc").alias("part"),
        "doc_id",
        F.col("n_tokens").cast("long").alias(hits_cols[0]),
        *[lnull.alias(c) for c in hits_cols[1:]],
        snull.alias("lang_guess"),
        dnull.alias("quality"),
        snull.alias("fp"),
    )
    return doc_part.unionByName(merge_part).unionByName(enc_part)


def _bpe_oracle_ctes() -> str:
    """The greedy-BPE replay: word table → per-round (pair count → argmax
    with (count desc, pair asc) tie-break and >=2 stop → one replace()
    rewrite). Each round is one unrolled CTE pair; an exhausted corpus
    (no pair >= 2) yields an empty b{i} and the LEFT JOIN carries words
    through unchanged — matching the trainer's early stop."""
    ctes = [
        f"""bdocs AS (
  SELECT doc_id, lower(regexp_replace(text, '{_BPE_CLEAN_RE}', ' ', 'g')) AS tc
  FROM documents ORDER BY doc_id LIMIT {_BPE_DOCS}
)""",
        """bwords AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(list_filter(string_split_regex(trim(tc), '\\s+'),
                              x -> x <> '')) AS w
    FROM bdocs
  ) GROUP BY w
)""",
        """w0 AS MATERIALIZED (
  SELECT w, '(' || array_to_string(string_split(w, ''), ')(') || ')(</w>)' AS s,
         freq
  FROM bwords
)""",
    ]
    for i in range(_BPE_MERGES):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT pr, sum(freq) AS c FROM (
    SELECT unnest(list_transform(range(1, len(l)), j -> l[j] || ' ' || l[j+1])) AS pr,
           freq
    FROM (SELECT string_split(s[2:-2], ')(') AS l, freq FROM w{i})
  ) GROUP BY pr HAVING sum(freq) >= 2
),
b{i} AS MATERIALIZED (
  SELECT string_split(pr, ' ')[1] AS le, string_split(pr, ' ')[2] AS ri
  FROM p{i} ORDER BY c DESC, pr LIMIT 1
),
w{i + 1} AS MATERIALIZED (
  SELECT w,
         CASE WHEN b.le IS NULL THEN s
              ELSE replace(s, '(' || b.le || ')(' || b.ri || ')',
                           '(' || b.le || b.ri || ')') END AS s,
         freq
  FROM w{i} LEFT JOIN b{i} b ON TRUE
)"""
        )
    ranked = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, le, ri FROM b{i}" for i in range(_BPE_MERGES)
    )
    ctes.append(f"bmerges AS (\n{ranked}\n)")
    ctes.append(
        f"""bencn AS (
  SELECT b.doc_id, coalesce(s.n, 0) AS n FROM bdocs b LEFT JOIN (
    SELECT d.doc_id,
           CAST(sum(len(string_split(wk.s[2:-2], ')('))) AS BIGINT) AS n
    FROM (
      SELECT doc_id, unnest(list_filter(string_split_regex(trim(tc), '\\s+'),
                                        x -> x <> '')) AS w
      FROM bdocs
    ) d JOIN w{_BPE_MERGES} wk ON wk.w = d.w
    GROUP BY d.doc_id
  ) s USING (doc_id)
)"""
    )
    return ",\n".join(ctes)


def _text_lang_quality_fp_oracle() -> str:
    hits = {
        lang: (
            "CAST(len(list_filter(tk, t -> lower(t) IN ("
            + ", ".join(f"'{w}'" for w in text.STOPWORDS[lang])
            + "))) AS BIGINT)"
        )
        for lang in text.LANGS
    }
    mx = "greatest(" + ", ".join(f"hits_{lang}" for lang in text.LANGS) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{lang} > 0 AND hits_{lang} = {mx} THEN '{lang}'"
        for lang in text.LANGS
    ) + " ELSE 'und' END"
    cols = ", ".join(f"{sql} AS hits_{lang}" for lang, sql in hits.items())
    hits_list = ", ".join(f"hits_{lang}" for lang in text.LANGS)
    null_hits = ", ".join(
        f"CAST(NULL AS BIGINT) AS hits_{lang}" for lang in text.LANGS
    )
    enc_hits = ", ".join(
        ["n AS hits_" + text.LANGS[0]]
        + [f"CAST(NULL AS BIGINT) AS hits_{lang}" for lang in text.LANGS[1:]]
    )
    return (
        f"WITH {_TOKS}, h AS (SELECT doc_id, text, {cols},\n"
        f"  CAST(len(tk) AS BIGINT) AS n_tok,\n"
        f"  CASE WHEN len(tk) > 0 THEN CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) ELSE 0.0 END AS dr,\n"
        f"  CASE WHEN len(tk) > 0 THEN CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk) ELSE 0.0 END AS mwl\n"
        f"  FROM toks),\n"
        f"{_bpe_oracle_ctes()}\n"
        f"SELECT 'doc' AS part, doc_id, {hits_list}, "
        f"{case} AS lang_guess,\n"
        f"  {_O}(least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) + dr\n"
        f"         + CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) / 3.0{_C} AS quality,\n"
        f"  substr(md5(text), 1, 16) AS fp\n"
        f"FROM h\n"
        f"UNION ALL\n"
        f"SELECT 'bpe', rank, {null_hits}, le, CAST(NULL AS DOUBLE), ri FROM bmerges\n"
        f"UNION ALL\n"
        f"SELECT 'enc', doc_id, {enc_hits}, CAST(NULL AS VARCHAR), "
        f"CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR) FROM bencn"
    )


_q("text_lang_quality_fp", _text_lang_quality_fp, _text_lang_quality_fp_oracle())

# Shared winnow CTE chain: exact char-k-gram rolling hash + window minima,
# mirroring text.winnow_fingerprints step by step. Used by both parts of
# the winnow_fingerprints entry.
_WINNOW_CTES = f"""t AS (SELECT doc_id, trim(text) AS t FROM documents),
grams AS (
  SELECT doc_id, t,
         [substr(t, i, {text.WINNOW_K}) for i in generate_series(1, greatest(length(t) - {text.WINNOW_K - 1}, 0))] AS gs
  FROM t
),
hashes AS (
  SELECT doc_id, t, list_transform(gs, g -> list_reduce(
      list_prepend(CAST(0 AS BIGINT), [CAST(ascii(g[i]) AS BIGINT) for i in generate_series(1, length(g))]),
      (a, b) -> (a * {text.WINNOW_BASE} + b) % {text.WINNOW_MOD})) AS hs
  FROM grams
),
mins AS (
  SELECT doc_id, CASE WHEN length(t) >= {text.WINNOW_K + text.WINNOW_W - 1} THEN
    list_sort(list_distinct([list_min(hs[i:i+{text.WINNOW_W - 1}]) for i in generate_series(1, greatest(len(hs) - {text.WINNOW_W - 1}, 0))]))
    ELSE [] END AS fp
  FROM hashes
)"""

_WOP_MIN_SHARED = 2
_WOP_MAX_FP_DOCS = 64


def _winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints + containment pairs, one labeled union
    (round-9 rotation of `text.winnow_overlap_pairs` into the driver
    catalog, consolidated under the 50-entry cap):

    - ``fp``: the per-doc fingerprint explosion (a=doc_id, v=fp);
    - ``pair``: (a, b, v=shared, x=overlap) for pairs sharing ≥2
      fingerprints after the >64-docs hot-fingerprint guard — containment
      detection (a quoted paragraph in a larger doc) that whole-document
      Jaccard scores near zero.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", F.explode(text.winnow_fingerprints(F.col("text"))).alias("fp")
    ).select(
        F.lit("fp").alias("part"),
        F.col("doc_id").alias("a"),
        F.lit(None).cast("long").alias("b"),
        F.col("fp").alias("v"),
        F.lit(None).cast("double").alias("x"),
    )
    pr = text.winnow_overlap_pairs(
        docs, min_shared=_WOP_MIN_SHARED, max_fp_docs=_WOP_MAX_FP_DOCS
    ).select(
        F.lit("pair").alias("part"),
        "a",
        "b",
        F.col("shared").alias("v"),
        F.col("overlap").alias("x"),
    )
    return fp.unionByName(pr)


_q(
    "winnow_fingerprints",
    _winnow,
    # The pair half replays the engine's drop_hot_keys(fp > max_fp_docs)
    # guard, the i<j pair expansion, and the min-size overlap ratio. The
    # overlap is a division of identical ints → identical doubles, so
    # plain round(x, 6) matches.
    f"""WITH {_WINNOW_CTES},
ex AS (SELECT doc_id, unnest(fp) AS fp FROM mins),
hot AS (SELECT fp FROM ex GROUP BY fp HAVING count(*) > {_WOP_MAX_FP_DOCS}),
ex2 AS (SELECT e.doc_id, e.fp FROM ex e ANTI JOIN hot h ON e.fp = h.fp),
shp AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS shared
        FROM ex2 l JOIN ex2 r ON l.fp = r.fp AND l.doc_id < r.doc_id
        GROUP BY 1, 2 HAVING count(*) >= {_WOP_MIN_SHARED}),
sizes AS (SELECT doc_id, len(fp) AS nfp FROM mins WHERE len(fp) > 0)
SELECT 'fp' AS part, doc_id AS a, CAST(NULL AS BIGINT) AS b,
       unnest(fp) AS v, CAST(NULL AS DOUBLE) AS x FROM mins
UNION ALL
SELECT 'pair', shp.a, shp.b, CAST(shp.shared AS BIGINT),
       round(CAST(shp.shared AS DOUBLE) / least(na.nfp, nb.nfp), 6)
FROM shp JOIN sizes na ON na.doc_id = shp.a
         JOIN sizes nb ON nb.doc_id = shp.b""",
)

# --- dedup --------------------------------------------------------------------
_q(
    "dedup_exact",
    lambda spark, sf_dir: dedup.exact_dedup_groups(
        load_table(spark, sf_dir, "documents")
    ),
    "SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies "
    "FROM documents GROUP BY 1",
)


def _minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.minhash_near_dups(docs, threshold=0.2)
    return out.select("a", "b", _r6(F.col("jaccard")).alias("jaccard"))


_MINH_COLS = ", ".join(
    f"min(({dedup.MINHASH_A[i]} * hm + {dedup.MINHASH_B[i]}) % {dedup.MINHASH_P}) AS m{i}"
    for i in range(dedup.NUM_HASHES)
)
_BAND_SIG_CASE = "CASE band " + " ".join(
    f"WHEN {b} THEN CAST(m{b * dedup.BAND_ROWS} AS VARCHAR) || ',' || "
    f"CAST(m{b * dedup.BAND_ROWS + 1} AS VARCHAR)"
    for b in range(dedup.NUM_BANDS)
) + " END"

# The bhot/bands pair replays the engine's `drop_hot_keys(band_sigs,
# ["band","sig"], LSH_MAX_BUCKET)` guard exactly: a (band, sig) bucket
# holding more than LSH_MAX_BUCKET docs (boilerplate collapse) contributes
# no candidate pairs on either engine.  A no-op on uniform corpora; load-
# bearing on the skew twin, where one doc family is sized past the guard.
_MINHASH_CTES = f"""{_TOKS}, {_SHINGLES},
-- shh: the 60-bit hash64 shingle sets — the verify intersects HASHES on
-- both engines (round 9: bucket_verified_pairs carries hash arrays, not
-- strings, so the bucket shuffle is 8 bytes/shingle; a collision would
-- merge elements in both engines' sets identically)
shh AS (SELECT DISTINCT doc_id, {_HASH.format("sh")} AS hh FROM sh),
basehash AS (
  SELECT doc_id, hh % {dedup.MINHASH_M} AS hm FROM shh
),
minh AS (
  SELECT doc_id, {_MINH_COLS} FROM basehash GROUP BY doc_id
),
bands0 AS (
  SELECT doc_id, band, {_BAND_SIG_CASE} AS sig
  FROM minh, unnest(generate_series(0, {dedup.NUM_BANDS - 1})) AS bb(band)
),
bhot AS (
  SELECT band, sig FROM bands0 GROUP BY band, sig
  HAVING count(*) > {dedup.LSH_MAX_BUCKET}
),
bands AS (
  SELECT b.doc_id, b.band, b.sig FROM bands0 b
  ANTI JOIN bhot h ON b.band = h.band AND b.sig = h.sig
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r ON l.band = r.band AND l.sig = r.sig AND l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shh GROUP BY 1),
common AS (
  SELECT c.a, c.b, count(*) AS common
  FROM cand c
  JOIN shh sa ON sa.doc_id = c.a
  JOIN shh sb ON sb.doc_id = c.b AND sb.hh = sa.hh
  GROUP BY 1, 2
),
jac AS (
  SELECT c.a, c.b,
         CAST(coalesce(m.common, 0) AS DOUBLE) / (na.n + nb.n - coalesce(m.common, 0)) AS jaccard
  FROM cand c
  LEFT JOIN common m ON m.a = c.a AND m.b = c.b
  JOIN sizes na ON na.doc_id = c.a
  JOIN sizes nb ON nb.doc_id = c.b
)"""

_q(
    "minhash_lsh_pairs",
    _minhash,
    f"WITH {_MINHASH_CTES}\n"
    f"SELECT a, b, {_O}jaccard{_C} AS jaccard FROM jac WHERE jaccard >= 0.2",
)


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash-LSH pairs → connected components →
    (doc_id, cluster_id = component min). The canonical-keeper step after
    pair generation; iterative min-label propagation on Spark, transitive
    closure in the oracle — same components exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_near_dup_clusters(docs, threshold=0.2)


def _uf_min_groups(pairs) -> tuple:
    """Union-find over (a, b) edges; returns ((id, component_min), ...) for
    EVERY id appearing in any edge — component roots included, mapping to
    themselves — matching ``cluster_pairs``' non-trivial-components output."""
    parent: dict = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    seen = set()
    for a, b in pairs:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return tuple(sorted((i, find(i)) for i in seen))


@functools.lru_cache(maxsize=8)
def _minhash_groups_cached(sf_dir: str, curated: bool) -> tuple:
    """Independent closure oracle for the MinHash near-dup components: the
    verified pair set comes from the SAME DuckDB pair chain the pair
    entries are checked against (shingle → minhash → banded LSH with the
    hot-bucket drop → exact-Jaccard verify — linear-cost SQL, no Spark
    anywhere), and the transitive closure over those pairs runs as a python
    union-find whose (id, component-min) rows are inlined as literals.

    Why not closure-in-SQL: the former recursive CTE enumerated reach
    PAIRS — O(component²) rows — which the round-8 Zipf-skew twin's
    boilerplate near-clique drove to a 24-minute oracle for a 60k-doc
    corpus (engine side: seconds), and which could never certify the third
    decade. Components are the O(n) object; same scheme as the SemDeDup
    group oracle (`_sem_groups_cached`)."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    if curated:
        sql = (
            f"WITH {_CURATION_KEPT_CTES},\n"
            + _MINHASH_CTES.replace("FROM documents", "FROM dkept", 1)
            + f"\nSELECT a, b FROM jac WHERE jaccard >= {_CURATE_J}"
        )
    else:
        sql = f"WITH {_MINHASH_CTES}\nSELECT a, b FROM jac WHERE jaccard >= 0.2"
    return _uf_min_groups(con.sql(sql).fetchall())


def _dedup_clusters_oracle() -> str:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    groups = _minhash_groups_cached(sf_dir, False)
    if not groups:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, "
            "CAST(NULL AS BIGINT) AS cluster_id WHERE 1=0"
        )
    vals = ", ".join(f"({i}, {g})" for i, g in groups)
    return (
        f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"CAST(cluster_id AS BIGINT) AS cluster_id "
        f"FROM (VALUES {vals}) v(doc_id, cluster_id)"
    )


_q("dedup_clusters", _dedup_clusters, _dedup_clusters_oracle)

# --- end-to-end corpus curation ----------------------------------------------
# quality gate → exact dedup → near-dup collapse, the full training-data
# composition, oracle-checked: the quality closed form is the proven
# text_lang_quality_fp formula, exact dedup is the proven md5 grouping, and
# the near-dup stage is the proven MinHash chain + transitive closure — here
# rebuilt over the POST-gate POST-dedup survivor set (`dkept`).
_CURATE_Q = 0.6431  # ≥2.3e-4 from any doc's quality at sf0.001/0.01/0.1
_CURATE_J = 0.2


def _corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.curate_corpus(
        docs, min_quality=_CURATE_Q, near_dup_threshold=_CURATE_J
    )
    return out.select("doc_id", _r6(F.col("quality")).alias("quality"))


_CURATION_KEPT_CTES = f"""qtoks AS (
  SELECT doc_id, text, CASE WHEN length(trim(text)) = 0 THEN []
         ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk FROM documents
),
qh AS (
  SELECT doc_id, text, CAST(len(tk) AS BIGINT) AS n_tok,
    CASE WHEN len(tk) > 0 THEN CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) ELSE 0.0 END AS dr,
    CASE WHEN len(tk) > 0 THEN CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / len(tk) ELSE 0.0 END AS mwl
  FROM qtoks
),
scored AS (
  SELECT doc_id, text,
    (least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) + dr
     + CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) / 3.0 AS q
  FROM qh
),
kept AS (SELECT doc_id, text, q FROM scored WHERE q >= {_CURATE_Q}),
keep_ids AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
dkept AS (SELECT k.doc_id, k.text, k.q FROM kept k JOIN keep_ids ki USING (doc_id))"""


def _corpus_curation_oracle() -> str:
    """Quality gate + exact dedup stay pure SQL; the near-dup closure over
    the post-gate survivor pairs comes from the shared union-find oracle
    (see `_minhash_groups_cached` for why closure-in-SQL had to go).
    Losers — component members that are not the component min — are
    inlined and anti-joined away."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    losers = [i for i, g in _minhash_groups_cached(sf_dir, True) if i != g]
    if losers:
        lsrc = (
            "(VALUES " + ", ".join(f"({i})" for i in losers) + ") l(doc_id)"
        )
    else:
        lsrc = "(SELECT CAST(NULL AS BIGINT) AS doc_id WHERE 1=0) l"
    return f"""WITH {_CURATION_KEPT_CTES},
losers AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM {lsrc})
SELECT d.doc_id, {_O}d.q{_C} AS quality
FROM dkept d ANTI JOIN losers USING (doc_id)"""


_q("corpus_curation", _corpus_curation, _corpus_curation_oracle)

_SIMHASH_SQL = f"""dtok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []
                          ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
    FROM documents)
),
th AS (SELECT doc_id, {_HASH.format("tok")} AS th FROM dtok),
perbit AS (
  SELECT doc_id, bit, sum(CASE WHEN (th >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, unnest(generate_series(0, {dedup.SIMHASH_BITS - 1})) AS b(bit)
  GROUP BY 1, 2
),
sim AS (
  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
  FROM perbit GROUP BY 1
)"""

# (simhash signatures are checked as the 'sig' part of the merged
# `near_dup_scores` entry — the round-9 consolidation that freed a slot
# for `funnel_retention` under the driver's 50-entry cap)


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (registered as the 'simhash' part of the merged `near_dup_scores`
    # entry — the late-round-6 consolidation that freed a slot for
    # `doc_chunking`; the signatures keep their own driver row.)
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.simhash_near_pairs(
        docs, max_hamming=3, max_bucket=dedup.LSH_MAX_BUCKET
    )
    return out.select("a", "b", F.col("hamming").cast("int").alias("hamming"))


# Banded oracle twin mirroring the engine's pigeonhole join AND its
# hot-bucket guard (`drop_hot_keys` on (band, bandval)): same 4×8-bit
# bands, same `> LSH_MAX_BUCKET` drop, so a boilerplate family collapsing
# onto one simhash is excluded identically on both engines.  `>>` is an
# arithmetic shift on both engines, but `& mask` keeps only the low
# band-width bits, so sign-extension cannot differ.
_SIMHASH_BW = dedup.SIMHASH_BITS // dedup.SIMHASH_BANDS
_SIMHASH_PAIRS_CTES = f"""sb0 AS (
  SELECT doc_id, simhash, band,
         (simhash >> (band * {_SIMHASH_BW})) & {(1 << _SIMHASH_BW) - 1} AS bandval
  FROM sim, unnest(generate_series(0, {dedup.SIMHASH_BANDS - 1})) AS bb(band)
),
sbhot AS (
  SELECT band, bandval FROM sb0 GROUP BY 1, 2
  HAVING count(*) > {dedup.LSH_MAX_BUCKET}
),
sbg AS (
  SELECT s.doc_id, s.simhash, s.band, s.bandval FROM sb0 s
  ANTI JOIN sbhot h ON s.band = h.band AND s.bandval = h.bandval
),
simpairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.simhash AS ha, r.simhash AS hb
  FROM sbg l JOIN sbg r
    ON l.band = r.band AND l.bandval = r.bandval AND l.doc_id < r.doc_id
)"""
_SIMHASH_PAIRS_SELECT = """SELECT a, b, CAST(bit_count(xor(ha, hb)) AS DOUBLE) AS score
FROM simpairs WHERE bit_count(xor(ha, hb)) <= 3"""


def _ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    pairs = dedup.ngram_jaccard_pairs(docs)
    return (
        pairs.orderBy(F.col("jaccard").desc(), F.col("a"), F.col("b"))
        .limit(10)
        .select("a", "b", _r6(F.col("jaccard")).alias("jaccard"))
    )


# (registered below as half of the merged `near_dup_scores` entry — round-6
# consolidation that freed a catalog slot for `corpus_mix`)
_NGRAM_TOPK_CTES = f"""{_TOKS},
-- shl: the 60-bit hash64 shingle sets (r15) — the intersect runs over
-- HASHES on both engines, mirroring the engine's hashed
-- ngram_jaccard_pairs; a collision merges elements identically in both
-- sets (the round-9 bucket_verified_pairs argument), so |inter| and
-- |union| cannot drift cross-engine
shl AS (
  SELECT doc_id,
         list_distinct([{_HASH.format("tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]")}
                        for i in generate_series(1, greatest(len(tk) - 2, 0))]) AS shs
  FROM toks WHERE doc_id < 100
),
ngpairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_filter(a.shs, x -> list_contains(b.shs, x))) AS inter,
         len(a.shs) + len(b.shs) - len(list_filter(a.shs, x -> list_contains(b.shs, x))) AS un
  FROM shl a, shl b WHERE a.doc_id < b.doc_id
),
ngtop AS (
  SELECT a, b, {_O}jaccard{_C} AS score FROM (
    SELECT a, b, CASE WHEN un > 0 THEN CAST(inter AS DOUBLE) / un ELSE 0.0 END AS jaccard
    FROM ngpairs)
  ORDER BY jaccard DESC, a, b LIMIT 10
)"""

# --- similarity search --------------------------------------------------------
_DOT = (
    "list_sum([CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) "
    "for i in generate_series(1, len(qe))])"
)
_NQ = "sqrt(list_sum([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) for i in generate_series(1, len(qe))]))"
_NC = "sqrt(list_sum([CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE) for i in generate_series(1, len(ce))]))"


def _knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the Arrow/matmul kernel (r11): same exact top-k as knn_brute (pinned
    # equal at the shared 1e-6 rounding), one BLAS matmul per batch instead
    # of per-pair interpreted folds, and far tighter run-to-run variance —
    # the r10 "knn regression" was the HOF path's scheduler noise band
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.knn_brute_arrow(
        emb.where(F.col("vec_id") < 5), emb.where(F.col("vec_id") >= 5), k=5
    )
    return out.select("query_id", "vec_id", _r6(F.col("cosine")).alias("cosine"), "rank")


_q(
    "knn_cosine_brute",
    _knn,
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding AS ce FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, c.vec_id, {_DOT} / ({_NQ} * {_NC}) AS cosine
  FROM c CROSS JOIN q
)
SELECT query_id, vec_id, {_O}cosine{_C} AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5""",
)


def _ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.ann_sign_lsh(
        emb.where(F.col("vec_id") < 5), emb.where(F.col("vec_id") >= 5), k=3
    )
    return out.select("query_id", "vec_id", _r6(F.col("cosine")).alias("cosine"), "rank")


# multi-probe join: corpus bucket equals the query bucket or any 1-bit flip.
# ±1 hyperplanes keep the projection bit-for-bit reproducible in DuckDB
# (same index-order additions, no rounding in the ±1 multiply).
_PROBES = ", ".join(
    ["q.bucket"] + [f"xor(q.bucket, {1 << b})" for b in range(similarity.LSH_BITS)]
)

_q(
    "ann_lsh_cosine",
    _ann,
    f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
           {similarity.sign_bucket_sql("embedding")} AS bucket
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding AS ce,
      {similarity.sign_bucket_sql("embedding")} AS bucket
      FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, c.vec_id, {_DOT} / ({_NQ} * {_NC}) AS cosine
  FROM c JOIN q ON c.bucket IN ({_PROBES})
)
SELECT query_id, vec_id, {_O}cosine{_C} AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 3""",
)

def _drift_props(d) -> F.Column:
    """Deterministic drift-injected JSON object per doc_id, built from the
    SAME string concatenation in the oracle (_DRIFT_PROPS_SQL) — so
    `jsonprof.json_key_stats`' type classification and per-key counts are
    exactly checkable: key 'a' drifts int → quoted-int → null, 'b' is
    float, 't' string, 'flag' bool, and nested/array values classify as
    string (the documented from_json rendering)."""
    return (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit('{"a":'),
                (d % 97).cast("string"),
                F.lit(',"b":'),
                (d % 7).cast("string"),
                F.lit('.5,"t":"s'),
                (d % 3).cast("string"),
                F.lit('"}'),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(F.lit('{"a":"'), (d % 97).cast("string"), F.lit('","flag":true}')),
        )
        .when(d % 4 == 2, F.lit('{"a":null,"nested":{"x":1}}'))
        .otherwise(F.lit('{"t":"plain","arr":[1,2]}'))
    )


_DRIFT_PROPS_SQL = """CASE
  WHEN doc_id % 4 = 0 THEN '{"a":' || (doc_id % 97) || ',"b":' || (doc_id % 7) || '.5,"t":"s' || (doc_id % 3) || '"}'
  WHEN doc_id % 4 = 1 THEN '{"a":"' || (doc_id % 97) || '","flag":true}'
  WHEN doc_id % 4 = 2 THEN '{"a":null,"nested":{"x":1}}'
  ELSE '{"t":"plain","arr":[1,2]}' END"""


# Round-13 rotation (VERDICT r12 item 4): zlib compression_ratio golden
# vectors. DuckDB 1.0 ships no zlib, so the kernel's exact outputs are
# pinned two ways: the ``zlit`` part runs the REAL Arrow kernel over fixed
# literal inputs spanning the compressibility range (boilerplate / english /
# hex noise / empty / shorter-than-overhead) and the oracle inlines the
# expected (n_bytes, n_compressed, ratio) computed HERE at import with the
# same stdlib zlib call the kernel makes — deterministic for a fixed level
# in one environment; the ``zdoc`` part runs the kernel over the whole
# documents table and oracles the byte-length column (strlen — the UTF-8
# encode half of the kernel — is what DuckDB can twin without zlib).
_ZLIT: list[tuple[str, str]] = [
    ("rep", "spamspam" * 200),
    ("eng", "The quick brown fox jumps over the lazy dog. " * 30),
    (
        "hex",
        "".join(format((i * 2654435761) % 2**32, "08x") for i in range(160)),
    ),
    ("empty", ""),
    ("short", "xyz"),
]


def _zlit_expected() -> list[tuple[str, int, int | None, float | None]]:
    import zlib

    out = []
    for name, t in _ZLIT:
        b = t.encode("utf-8")
        if not b:
            out.append((name, 0, 0, None))
            continue
        c = len(zlib.compress(b, 6))
        out.append((name, len(b), c, round(c / len(b), 6)))
    return out


# one probe per Spark application: the parity check below costs a 1-row job
_ZLIB_PARITY_OK: dict[str, bool] = {}


def _assert_zlib_parity(spark: SparkSession) -> None:
    """The zlit golden vectors inline DRIVER-computed ``zlib.compress``
    lengths while the kernel compresses on EXECUTORS; exact-length equality
    is only sound when both tiers run the same zlib build — a zlib-ng
    substitution on either side legitimately changes compressed sizes
    (ADVICE r13). Probe once per application: compress the golden inputs on
    an executor and compare lengths, raising a CLEAR error instead of
    letting the contract entry fail as a mysterious hash mismatch. In a
    single-JVM local[] deployment driver == executor and this never fires;
    on a real cluster it turns an environment skew into a diagnosis."""
    app = spark.sparkContext.applicationId
    if _ZLIB_PARITY_OK.get(app):
        return
    texts = [t for _, t in _ZLIT]  # plain list: pickled by value into the
    # closure — no module reference a bare-session worker can't import

    def _probe(ts):
        import zlib

        return (
            zlib.ZLIB_RUNTIME_VERSION,
            [len(zlib.compress(t.encode("utf-8"), 6)) if t else 0 for t in ts],
        )

    exec_ver, exec_lens = spark.sparkContext.parallelize([texts], 1).map(_probe).collect()[0]
    import zlib

    drv_lens = [nc or 0 for _, _, nc, _ in _zlit_expected()]
    if list(exec_lens) != drv_lens:
        raise RuntimeError(
            "zlib build skew between driver and executors: driver "
            f"zlib {zlib.ZLIB_RUNTIME_VERSION} compresses the zlit golden "
            f"vectors to {drv_lens} bytes, executor zlib {exec_ver} to "
            f"{list(exec_lens)} — the compression_ratio golden-vector "
            "oracle requires one zlib build on both tiers"
        )
    _ZLIB_PARITY_OK[app] = True


_ZLIT_SQL = "\nUNION ALL\n".join(
    f"SELECT 'zlit' AS part, '{name}' AS s, CAST({nb} AS BIGINT) AS c1, "
    f"CAST({nc} AS BIGINT) AS c2, CAST(NULL AS BIGINT) AS c3, "
    f"CAST({'NULL' if ratio is None else repr(ratio)} AS DOUBLE) AS d, "
    f"CAST(NULL AS BIGINT) AS c4, CAST(NULL AS BIGINT) AS c5"
    for name, nb, nc, ratio in _zlit_expected()
)


def _corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling, one labeled union (r11 rotation adds the jsonkey
    half, giving `jsonprof.json_key_stats` a full hash oracle; r13 adds the
    compression halves):

    - ``src``: per-source summary — the bread-and-butter sweep a
      training-data pipeline runs before filtering decisions.
    - ``jsonkey``: JSON schema-drift profile over a deterministic
      drift-injected props column (see _drift_props) — per-key presence
      and value-type counts.
    - ``zlit``/``zdoc``: `text.compression_ratio` (the Gopher/RefinedWeb
      compressibility cut) — golden zlib vectors + the per-document byte
      lengths (see _ZLIT rationale above)."""
    from sydradb_spark.pipeline import jsonprof

    docs = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    src = docs.groupBy("source").agg(
        F.count("*").alias("c1"),
        F.sum(F.size(toks)).alias("c2"),
        F.countDistinct("lang").alias("c3"),
        _r6(F.avg(F.length("text"))).alias("d"),
        F.min("n_chars").cast("long").alias("c4"),
        F.max("n_chars").cast("long").alias("c5"),
    ).select(F.lit("src").alias("part"), F.col("source").alias("s"), "c1", "c2", "c3", "d", "c4", "c5")
    jk = jsonprof.json_key_stats(
        docs.select(_drift_props(F.col("doc_id")).alias("props")), "props"
    ).select(
        F.lit("jsonkey").alias("part"),
        F.col("key").alias("s"),
        F.col("n_rows").alias("c1"),
        F.col("n_int").alias("c2"),
        F.col("n_float").alias("c3"),
        F.col("n_bool").cast("double").alias("d"),
        F.col("n_string").alias("c4"),
        F.col("n_null").alias("c5"),
    )
    lnull = F.lit(None).cast("long")
    _assert_zlib_parity(spark)  # golden-vector soundness gate (ADVICE r13)
    zlit = text.compression_ratio(
        spark.createDataFrame(_ZLIT, "doc_id string, text string")
    ).select(
        F.lit("zlit").alias("part"),
        F.col("doc_id").alias("s"),
        F.col("n_bytes").alias("c1"),
        F.col("n_compressed").alias("c2"),
        lnull.alias("c3"),
        F.col("ratio").alias("d"),
        lnull.alias("c4"),
        lnull.alias("c5"),
    )
    zdoc = text.compression_ratio(docs).select(
        F.lit("zdoc").alias("part"),
        F.col("doc_id").cast("string").alias("s"),
        F.col("n_bytes").alias("c1"),
        lnull.alias("c2"),
        lnull.alias("c3"),
        F.lit(None).cast("double").alias("d"),
        lnull.alias("c4"),
        lnull.alias("c5"),
    )
    return src.unionByName(jk).unionByName(zlit).unionByName(zdoc)


_q(
    "corpus_stats",
    _corpus_stats,
    f"""WITH props AS (
  SELECT {_DRIFT_PROPS_SQL} AS p FROM documents
),
kv AS (
  SELECT u.k AS k, p ->> u.k AS val
  FROM props, unnest(json_keys(p)) AS u(k)
),
cls AS (
  SELECT k,
    (val IS NULL) AS is_null,
    coalesce(val IN ('true', 'false'), false) AS is_bool,
    coalesce(regexp_matches(val, '^-?\\d+$'), false) AS is_int,
    coalesce(regexp_matches(val, '^-?\\d+\\.\\d+([eE][+-]?\\d+)?$')
             OR regexp_matches(val, '^-?\\d+[eE][+-]?\\d+$'), false) AS is_float
  FROM kv
)
SELECT 'src' AS part, source AS s, count(*) AS c1,
  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS c2,
  count(DISTINCT lang) AS c3,
  {_O}avg(length(text)){_C} AS d,
  CAST(min(n_chars) AS BIGINT) AS c4, CAST(max(n_chars) AS BIGINT) AS c5
FROM documents GROUP BY 2
UNION ALL
SELECT 'jsonkey', k, count(*),
  CAST(sum(CASE WHEN is_int THEN 1 ELSE 0 END) AS BIGINT),
  CAST(sum(CASE WHEN NOT is_int AND is_float THEN 1 ELSE 0 END) AS BIGINT),
  CAST(sum(CASE WHEN is_bool THEN 1 ELSE 0 END) AS DOUBLE),
  CAST(sum(CASE WHEN NOT is_null AND NOT is_bool AND NOT is_int AND NOT is_float
                THEN 1 ELSE 0 END) AS BIGINT),
  CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT)
FROM cls GROUP BY 2
UNION ALL
{_ZLIT_SQL}
UNION ALL
SELECT 'zdoc', CAST(doc_id AS VARCHAR), CAST(strlen(text) AS BIGINT),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM documents""",
)


def _embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = dedup.embedding_near_dups(
        emb, threshold=0.3, max_bucket=dedup.LSH_MAX_BUCKET
    )
    return out.select("a", "b", _r6(F.col("cosine")).alias("cosine"))


def _near_dup_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled union of the (a, b, score)-shaped near-dup scorers (merged
    round 6 to free slots for `corpus_mix` and `doc_chunking`): exact n-gram
    Jaccard top-10 over a 100-doc subset, embedding-cosine near-dups over
    sign-LSH candidates, and SimHash banded pairs (score = hamming).
    Round 9 folded the former `simhash_signatures` entry in as part
    ``sig`` (a = doc_id, b = the 64-bit SimHash) to free a catalog slot."""
    ng = _ngram_topk(spark, sf_dir).select(
        F.lit("ngram").alias("part"), "a", "b", F.col("jaccard").alias("score")
    )
    em = _embed_dedup(spark, sf_dir).select(
        F.lit("embed").alias("part"), "a", "b", F.col("cosine").alias("score")
    )
    # r15: compute the SimHash fingerprints ONCE — the ``sig`` part and the
    # banded-pair part are union branches, so without materialization each
    # re-ran the full tokenize+32-bit-fold fingerprint pass (the r15
    # before-plan shows the simhash subtree twice). One row per doc, tiny
    # checkpoint, identical output. LAZY (eager=False): the checkpoint's
    # persist dedups the subtree across consumers within the entry's one
    # action without paying a separate materialization job up front — the
    # interleaved A/B (OPTIMIZATION_r15.md) measured lazy ≤ eager ≤ none.
    sigs = dedup.simhash(load_table(spark, sf_dir, "documents")).localCheckpoint(
        eager=False
    )
    sh = dedup.simhash_near_pairs(
        load_table(spark, sf_dir, "documents"),
        max_hamming=3,
        max_bucket=dedup.LSH_MAX_BUCKET,
        sigs=sigs,
    ).select(
        F.lit("simhash").alias("part"),
        "a",
        "b",
        F.col("hamming").cast("int").cast("double").alias("score"),
    )
    sig = sigs.select(
        F.lit("sig").alias("part"),
        F.col("doc_id").alias("a"),
        F.col("simhash").alias("b"),
        F.lit(None).cast("double").alias("score"),
    )
    return ng.unionByName(em).unionByName(sh).unionByName(sig)


_q(
    "near_dup_scores",
    _near_dup_scores,
    f"""WITH {_NGRAM_TOPK_CTES},
{_SIMHASH_SQL},
{_SIMHASH_PAIRS_CTES},
t AS (
  SELECT vec_id, embedding AS e FROM embeddings
), tb AS (
  SELECT vec_id, e, {similarity.sign_bucket_sql("e")} AS bucket FROM t
), tbhot AS (
  SELECT bucket FROM tb GROUP BY 1 HAVING count(*) > {dedup.LSH_MAX_BUCKET}
), tbg AS (
  -- replays drop_hot_keys(["bucket"], LSH_MAX_BUCKET); NULL buckets never
  -- pair on either engine (equi-join), so the eqNullSafe difference on a
  -- hypothetical >1000-NULL-bucket corpus cannot change this output
  SELECT t.vec_id, t.e, t.bucket FROM tb t
  ANTI JOIN tbhot h ON t.bucket = h.bucket
), cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b, x.e AS ea, y.e AS eb
  FROM tbg x JOIN tbg y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
), scored AS (
  SELECT a, b,
    list_sum([CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE) for i in generate_series(1, len(ea))])
    / (sqrt(list_sum([CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE) for i in generate_series(1, len(ea))]))
     * sqrt(list_sum([CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE) for i in generate_series(1, len(eb))]))) AS cosine
  FROM cand
)
SELECT 'ngram' AS part, a, b, score FROM ngtop
UNION ALL
SELECT 'embed', a, b, {_O}cosine{_C} FROM scored WHERE cosine >= 0.3
UNION ALL
SELECT 'simhash', a, b, score FROM ({_SIMHASH_PAIRS_SELECT})
UNION ALL
SELECT 'sig', doc_id, simhash, CAST(NULL AS DOUBLE) FROM sim""",
)


# --- BM25 full-text retrieval ---------------------------------------------
# Fixed ASCII query: Python str.split == the engine analyzer on plain
# spaces, so the oracle's term literals are exact by construction. The
# entry checks the WHOLE scoring surface (index build, corpus stats, df/
# idf, per-doc score) for every hit doc, plus a deterministic ranking by
# the r6-STABILIZED score (raw-score ranking could flip across engines on
# a sub-ulp tie at the boundary; rounded-score + doc_id cannot).
_BM25_QUERY = "the data model and system"


def _bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sydradb_spark.pipeline import retrieval

    docs = load_table(spark, sf_dir, "documents")
    idx = retrieval.bm25_index(docs)
    n, avgdl = retrieval.bm25_corpus_stats(idx)
    scores = retrieval.bm25_scores(idx, _BM25_QUERY, n_docs=n, avgdl=avgdl)
    s6 = scores.select("doc_id", _r6(F.col("score")).alias("score"))
    # check-scale global ranking window (hundreds of hit rows at the
    # driver's sf); production top-k goes through bm25_search's TakeOrdered.
    # The constant partition key is explicit single-partition intent — same
    # plan, but no "WindowExec: No Partition Defined" alarm in profiles.
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return s6.withColumn("rank", F.row_number().over(w).cast("int"))


_BM25_TERMS = ", ".join(f"'{t}'" for t in sorted(set(_BM25_QUERY.split())))

_q(
    "bm25_retrieval",
    _bm25_retrieval,
    f"""WITH stripped AS (
  SELECT doc_id,
         regexp_replace(lower(text), '^[ \\t\\n\\x0b\\f\\r]+|[ \\t\\n\\x0b\\f\\r]+$', '', 'g') AS t
  FROM documents
), btoks AS (
  SELECT doc_id,
         CASE WHEN length(t) = 0 THEN []
              ELSE regexp_split_to_array(t, '[ \\t\\n\\x0b\\f\\r]+') END AS tk
  FROM stripped
), post AS (
  SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM btoks
), tfreq AS (
  SELECT term, doc_id, dl, count(*) AS tf FROM post GROUP BY 1, 2, 3
), bstats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl
  FROM (SELECT DISTINCT doc_id, dl FROM tfreq)
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tfreq
  WHERE term IN ({_BM25_TERMS}) GROUP BY 1
), bscored AS (
  SELECT tfreq.doc_id,
         sum(ln(1.0 + (bstats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * CAST(tfreq.tf AS DOUBLE) * (1.2 + 1.0)
             / (CAST(tfreq.tf AS DOUBLE)
                + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tfreq.dl AS DOUBLE) / bstats.avgdl))
         ) AS score
  FROM tfreq JOIN dfreq USING (term), bstats
  GROUP BY 1
)
SELECT doc_id, {_O}score{_C} AS score,
       CAST(row_number() OVER (ORDER BY {_O}score{_C} DESC, doc_id ASC) AS INTEGER) AS rank
FROM bscored""",
)


# --- SemDeDup semantic dedup -----------------------------------------------
# Same literal-inlining scheme as the IVF entry: the sample-kmeans trainer
# is not SQL-expressible, but it is deterministic (fixed first-N-by-id
# sample, fixed iterations, float64 numpy), so the oracle retrains the
# IDENTICAL centroids from the same parquet and inlines them — assignment,
# within-cluster pairs, transitive-closure groups, and the farthest-from-
# centroid keeper are then exactly checkable cross-engine.
_SEM_THRESHOLD = 0.95
_SEM_K = 8
_SEM_SAMPLE = 256
# oversized-cluster bypass, pinned to the same value engine- and oracle-side:
# members of a cluster past this size skip pair generation (kept, not deduped)
_SEM_MAXC = 100_000


@functools.lru_cache(maxsize=8)
def _sem_centroids_cached(sf_dir: str) -> tuple:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    t = t.sort_values("vec_id").head(_SEM_SAMPLE)
    x = [[float(v) for v in e] for e in t["embedding"]]
    return tuple(
        tuple(c) for c in similarity.kmeans_fit_sample(x, k=_SEM_K)
    )


def _semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = dedup.semantic_dedup(
        emb,
        threshold=_SEM_THRESHOLD,
        n_clusters=_SEM_K,
        sample_n=_SEM_SAMPLE,
        max_cluster=_SEM_MAXC,
    )
    return out.select(
        "vec_id",
        "cluster",
        "group_id",
        _r6(F.col("centroid_d2")).alias("centroid_d2"),
        F.col("keep").cast("int").alias("keep"),
        # r10: the hot-cluster bypass is now observable per row (r9 verdict
        # finding 1) — the oracle replays it as a window count over the
        # same cluster assignment
        F.col("bypassed").cast("int").alias("bypassed"),
    )


@functools.lru_cache(maxsize=8)
def _sem_groups_cached(sf_dir: str) -> tuple:
    """Independent numpy oracle for the GROUP structure: cluster-assign
    every vector against the shared centroid literals, replay the
    oversized-cluster bypass, enumerate within-cluster cosine>=t pairs as
    a float64 matrix product per cluster, and union-find them into
    components. Returns ((id, min-id-of-component), ...) for ids in
    non-trivial components only.

    Why not SQL: the former recursive-CTE transitive closure enumerates
    reach PAIRS — O(component²) rows with an O(component³)-ish join
    schedule — which the round-8 Zipf-skew twin's 1200-member near-clique
    (720k edges) drove to 357 s for a 3200-vector corpus, and which can
    never certify the third decade. Components themselves are the O(n)
    object; computing them with an independent union-find and inlining
    them as literals follows the entry's existing centroid-literal scheme
    (kmeans is not SQL-expressible either) and keeps every other column —
    assignment, d2, keeper choice — exactly checkable in SQL."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    ids = t["vec_id"].to_numpy()
    x = np.array([[float(v) for v in e] for e in t["embedding"]], dtype=np.float64)
    cents = np.array(_sem_centroids_cached(sf_dir), dtype=np.float64)
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cluster = d2.argmin(axis=1)
    edges: list = []
    for c in range(cents.shape[0]):
        members = np.nonzero(cluster == c)[0]
        if len(members) < 2 or len(members) > _SEM_MAXC:
            continue  # oversized cluster: bypass (kept, not deduped)
        v = x[members]
        norms = np.sqrt((v * v).sum(axis=1))
        cos = (v @ v.T) / np.outer(norms, norms)
        ai, bi = np.nonzero(np.triu(cos >= _SEM_THRESHOLD, k=1))
        edges.extend(
            (int(ids[p]), int(ids[q])) for p, q in zip(members[ai], members[bi])
        )
    # shared closure (`_uf_min_groups`) — ONE canonical union-find per
    # module; includes root self-rows (i, i), which the oracle's
    # coalesce'd LEFT JOIN maps identically to their absence
    return _uf_min_groups(edges)


def _semantic_dedup_oracle() -> str:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    cents = [list(c) for c in _sem_centroids_cached(sf_dir)]
    assign = similarity.assign_cluster_sql("e", cents)
    d2s = similarity.centroid_d2s_sql("e", cents)
    groups = _sem_groups_cached(sf_dir)
    if groups:
        sdg = "(VALUES " + ", ".join(f"({i}, {g})" for i, g in groups) + ") g(id, grp)"
    else:
        sdg = "(SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS grp WHERE 1=0) g"
    return f"""WITH sd AS (SELECT vec_id AS id, embedding AS e FROM embeddings),
sdt AS (
  SELECT id, e, CAST({assign} AS INTEGER) AS cluster, list_min({d2s}) AS d2
  FROM sd
),
-- group structure from the independent numpy union-find oracle (inlined
-- literals, same scheme as the centroids — see _sem_groups_cached)
sdg AS (SELECT id, grp FROM {sdg}),
sdl AS (
  SELECT t.id, t.cluster, coalesce(g.grp, t.id) AS group_id, t.d2
  FROM sdt t LEFT JOIN sdg g USING (id)
),
sdr AS (
  SELECT id, cluster, group_id, d2,
         row_number() OVER (PARTITION BY group_id ORDER BY d2 DESC, id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster) AS csz
  FROM sdl
)
SELECT id AS vec_id, cluster, group_id, {_O}d2{_C} AS centroid_d2,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep,
       CAST(CASE WHEN csz > {_SEM_MAXC} THEN 1 ELSE 0 END AS INTEGER) AS bypassed
FROM sdr"""


_q("semantic_dedup", _semantic_dedup, _semantic_dedup_oracle)


_IVF_K = 8
_IVF_NPROBE = 2
_IVF_TOPK = 5


def _ivf_centroids(sf_dir: str) -> list[list[float]]:
    """Deterministic sample-trained IVF centroids for ``sf_dir``, cached.

    TRAINING isn't SQL-expressible, but the trained result is just
    ``k × dim`` float64s — so train ONCE (driver-side numpy over the corpus,
    fixed seeds/iterations) and inline the centroids as literals into BOTH
    the Spark plan and the DuckDB oracle, exactly as ``sign_bucket_sql``
    does for the LSH hyperplanes. Assignment, probe selection, and top-k
    are then bit-for-bit checkable cross-engine."""
    return _ivf_centroids_cached(sf_dir)


@functools.lru_cache(maxsize=8)
def _ivf_centroids_cached(sf_dir: str) -> tuple:
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    # FAISS-style training-sample bound (max(10k, 256k_clusters) vectors):
    # deterministic first-N by vec_id, so the driver-side trainer stays O(1)
    # in corpus size; no-op at the test SFs (corpus < cap).
    cap = max(10_000, 256 * _IVF_K)
    df = df[df["vec_id"] >= 5].sort_values("vec_id").head(cap)
    x = np.stack(df["embedding"].to_numpy())
    cents = similarity.kmeans_fit_sample(x, k=_IVF_K, n_iters=8)
    return tuple(tuple(c) for c in cents)


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: sample-trained coarse quantizer (centroids shared with the
    generated oracle as literals), all-JVM assignment + probe + top-k."""
    cents = [list(c) for c in _ivf_centroids(sf_dir)]
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = emb.where(F.col("vec_id") >= 5).withColumn(
        "cluster", similarity.assign_cluster(F.col("embedding"), cents)
    )
    out = similarity.ann_ivf(
        emb.where(F.col("vec_id") < 5), assigned, cents,
        k=_IVF_TOPK, n_probe=_IVF_NPROBE,
    )
    return out.select("query_id", "vec_id", _r6(F.col("cosine")).alias("cosine"), "rank")


def _ann_ivf_oracle() -> str:
    """Generated at oracle_sql() time: recomputes assignment (argmin over
    the inlined centroid literals), the n_probe selection, and the exact
    per-probe top-k. The driver compares at sf0.01; SPARK_GRAFT_ORACLE_SF_DIR
    points the generator elsewhere for local runs at other scales."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    cents = [list(c) for c in _ivf_centroids(sf_dir)]
    assign_q = similarity.assign_cluster_sql("qe", cents)
    assign_c = similarity.assign_cluster_sql("ce", cents)
    d2s_q = similarity.centroid_d2s_sql("qe", cents)
    return f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, embedding AS ce, {assign_c} AS cluster FROM embeddings WHERE vec_id >= 5),
qd AS (SELECT query_id, qe, t.j - 1 AS cluster, ({d2s_q})[t.j] AS d2
       FROM q, generate_series(1, {_IVF_K}) AS t(j)),
probes AS (
  SELECT query_id, qe, cluster FROM qd
  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d2 ASC, cluster ASC) <= {_IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, c.vec_id, {_DOT} / ({_NQ} * {_NC}) AS cosine
  FROM c JOIN probes p ON c.cluster = p.cluster
)
SELECT query_id, vec_id, {_O}cosine{_C} AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {_IVF_TOPK}"""


_q("ann_ivf_cosine", _ann_ivf, _ann_ivf_oracle)

# --- multimodal ---------------------------------------------------------------
_q(
    "multimodal_meta",
    lambda spark, sf_dir: multimodal.media_metadata(
        multimodal.docs_as_media(load_table(spark, sf_dir, "documents"))
    ),
    # sha256(VARCHAR) hashes the utf-8 bytes == Spark's sha2(payload); the
    # magic-byte slice is char-based here (testdata text is ASCII).
    "SELECT doc_id AS media_id, 'image' AS kind, 'application/octet-stream' AS mime, "
    "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    "sha256(text) AS sha256, "
    "upper(hex(encode(substr(text, 1, 4)))) AS magic "
    "FROM documents",
)


# --- curation: decontamination, PII redaction, deterministic sampling ---------
_STRAT_FRACTIONS = [0.1, 0.4, 0.9]


@functools.lru_cache(maxsize=8)
def _strat_cuts_cached(sf_dir: str) -> tuple:
    """Exact tercile boundaries of documents.n_chars, computed driver-side
    from the parquet (numpy, deterministic) and inlined as literals into
    BOTH the Spark plan and the DuckDB oracle — the centroid-literal scheme
    (_ivf_centroids). The entry checks stratified_sample's FROZEN-cuts mode:
    stratum assignment (tie-up promotion) + per-stratum hash membership;
    the GK-sketch estimation path stays pytest-pinned (its cuts are
    approximate by design, so no cross-engine twin exists)."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    x = t.column("n_chars").to_numpy().astype("float64")
    x = x[~np.isnan(x)]
    return tuple(float(np.quantile(x, q)) for q in (1 / 3, 2 / 3))


def _decontam_pii_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation utilities, one labeled union (null-padded columns);
    the ``strat`` part is the r11 rotation: quantile-stratified sampling
    with frozen cut literals shared with the oracle (n = stratum).
    - contam: docs sharing a word 5-gram with the 'benchmark' set (every
      doc_id % 7 == 0 doc stands in for an eval benchmark) + hit counts;
    - pii: email/IPv4 redaction counts + redacted text over a synthesized
      PII suffix (the corpus itself carries no PII — the suffix makes the
      redaction machinery observable and deterministic);
    - sample: membership of the deterministic 20% hash sample (salt s0);
    - normalize: NFC + control-char/whitespace cleanup over a synthesized
      dirty suffix (decomposed accent, CRLF, control char, space runs —
      the corpus itself is clean, so the suffix makes every normalization
      step observable); n = chars removed, s = normalized text.
    """
    from sydradb_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    contam = curation.contamination_report(docs, bench).select(
        F.lit("contam").alias("part"),
        "doc_id",
        F.col("n_contaminated").alias("n"),
        F.lit(None).cast("string").alias("s"),
    )
    pii_in = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 now"),
        ).alias("text"),
    )
    r = curation.pii_redact_docs(pii_in)
    pii = r.select(
        F.lit("pii").alias("part"),
        "doc_id",
        (F.col("n_emails") + F.col("n_ips")).alias("n"),
        F.col("redacted").alias("s"),
    )
    samp = curation.hash_sample(docs, 0.2, salt="s0").select(
        F.lit("sample").alias("part"),
        "doc_id",
        F.lit(None).cast("long").alias("n"),
        F.lit(None).cast("string").alias("s"),
    )
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" x\r\ncafe\u0301  end\x01 "),
        ).alias("text"),
    )
    nd = curation.normalize_docs(dirty)
    norm = nd.select(
        F.lit("normalize").alias("part"),
        "doc_id",
        (F.col("n_chars_before") - F.col("n_chars_after")).alias("n"),
        F.col("text").alias("s"),
    )
    strat = curation.stratified_sample(
        docs,
        "n_chars",
        _STRAT_FRACTIONS,
        salt="strat0",
        cuts=list(_strat_cuts_cached(sf_dir)),
    ).select(
        F.lit("strat").alias("part"),
        "doc_id",
        F.col("stratum").cast("long").alias("n"),
        F.lit(None).cast("string").alias("s"),
    )
    return (
        contam.unionByName(pii)
        .unionByName(samp)
        .unionByName(norm)
        .unionByName(strat)
    )


def _decontam_oracle() -> str:
    import os

    from sydradb_spark.pipeline import curation

    email = curation.EMAIL_RE
    ipv4 = curation.IPV4_RE
    gram5 = " || ' ' || ".join(f"tk[i+{d}]" for d in range(5))
    # frozen stratification cuts, inlined as literals (see _strat_cuts_cached)
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    c1, c2 = _strat_cuts_cached(sf_dir)
    f1, f2, f3 = (round(f * 1_000_000) for f in _STRAT_FRACTIONS)
    strat_sql = (
        "strat AS (SELECT doc_id,\n"
        f"  CASE WHEN n_chars >= {c2!r} THEN 2 WHEN n_chars >= {c1!r} THEN 1 ELSE 0 END AS st\n"
        "  FROM documents WHERE n_chars IS NOT NULL),\n"
        "stratk AS (SELECT doc_id, st FROM strat\n"
        "  WHERE ('0x' || substr(md5('strat0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000\n"
        f"        < CASE st WHEN 0 THEN {f1} WHEN 1 THEN {f2} ELSE {f3} END),\n"
    )
    return (
        "WITH " + _TOKS + ",\n"
        "grams AS (SELECT DISTINCT doc_id, "
        "('0x' || substr(md5(" + gram5 + "), 1, 15))::BIGINT AS gh\n"
        "  FROM toks, unnest(generate_series(1, greatest(len(tk) - 4, 0))) AS u(i)),\n"
        "bench AS (SELECT DISTINCT gh FROM grams WHERE doc_id % 7 = 0),\n"
        "contam AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n\n"
        "  FROM grams g JOIN bench b ON g.gh = b.gh GROUP BY 1),\n"
        "pii_in AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)\n"
        "  || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 now' AS s\n"
        "  FROM documents),\n"
        "pii AS (SELECT doc_id,\n"
        "  CAST(len(regexp_extract_all(s, '" + email + "'))\n"
        "   + len(regexp_extract_all(regexp_replace(s, '" + email + "', '<EMAIL>', 'g'), '" + ipv4 + "')) AS BIGINT) AS n,\n"
        "  regexp_replace(regexp_replace(s, '" + email + "', '<EMAIL>', 'g'), '" + ipv4 + "', '<IP>', 'g') AS red\n"
        "  FROM pii_in),\n"
        "samp AS (SELECT doc_id FROM documents\n"
        "  WHERE ('0x' || substr(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 < 200000),\n"
        # normalize part: same dirty suffix, then the exact normalize_text
        # chain — nfc, CRLF->LF, strip C0-minus-tab/LF + DEL, collapse
        # spaces/tabs, strip spaces around LF, squeeze 3+ LFs, trim.
        + strat_sql +
        "norm_in AS (SELECT doc_id, text || ' x' || chr(13) || chr(10)\n"
        "  || 'cafe' || chr(769) || '  end' || chr(1) || ' ' AS s FROM documents),\n"
        "norm AS (SELECT doc_id, s, regexp_replace(regexp_replace(regexp_replace(\n"
        "    regexp_replace(regexp_replace(regexp_replace(nfc_normalize(s),\n"
        "    '\\r\\n?', chr(10), 'g'),\n"
        "    '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),\n"
        "    '[ \\t]+', ' ', 'g'),\n"
        "    ' *\\n *', chr(10), 'g'),\n"
        "    '\\n{3,}', chr(10) || chr(10), 'g'),\n"
        "    '^\\s+|\\s+$', '', 'g') AS clean FROM norm_in)\n"
        "SELECT 'contam' AS part, doc_id, n, CAST(NULL AS VARCHAR) AS s FROM contam\n"
        "UNION ALL SELECT 'pii', doc_id, n, red FROM pii\n"
        "UNION ALL SELECT 'sample', doc_id, CAST(NULL AS BIGINT), NULL FROM samp\n"
        "UNION ALL SELECT 'normalize', doc_id,\n"
        "  CAST(length(s) - length(clean) AS BIGINT), clean FROM norm\n"
        "UNION ALL SELECT 'strat', doc_id, CAST(st AS BIGINT), NULL FROM stratk"
    )


_q("decontam_pii_sample", _decontam_pii_sample, _decontam_oracle)


# --- corpus mixing ------------------------------------------------------------
_MIX_WEIGHTS = {"src0": 0.0, "src1": 0.4, "src2": 2.5, "src3": 2.0}


def _corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted training-mix: drop src0, 40% of src1, 2.5 epochs of src2,
    2 epochs of src3, everything else once (default weight 1.0)."""
    from sydradb_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    out = curation.mix_corpus(docs, _MIX_WEIGHTS, salt="mix0")
    return out.select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))


_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in _MIX_WEIGHTS.items())

_q(
    "corpus_mix",
    _corpus_mix,
    f"""WITH w(source, w) AS (VALUES {_MIX_VALUES}),
d AS (
  SELECT doc_id, documents.source AS source, coalesce(w.w, 1.0) AS w
  FROM documents LEFT JOIN w ON documents.source = w.source
),
e AS (
  SELECT doc_id, source, w, u.e AS epoch
  FROM d, unnest(generate_series(0, CAST(floor(w) AS INTEGER))) AS u(e)
  WHERE w > 0
)
SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM e
WHERE epoch < floor(w)
   OR ('0x' || substr(md5('mix0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
      < round((w - floor(w)) * 1000000)""",
)


# --- C4-style global line dedup -----------------------------------------------
def _line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate line removal over documents with a synthesized shared
    header (every doc) and a shared footer (every doc_id % 3 == 0 doc) —
    the corpus itself has no repeated lines, so the synthesis makes the
    global-frequency machinery observable. Returns per-doc removal counts +
    a cleaned-text fingerprint."""
    from sydradb_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    d2 = docs.select(
        "doc_id",
        F.concat(
            F.lit("shared header line\n"),
            F.col("text"),
            F.lit("\n"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("common footer")).otherwise(
                F.concat(F.lit("footer "), F.col("doc_id").cast("string"))
            ),
        ).alias("text"),
    )
    out = curation.remove_boilerplate_lines(d2, max_docs_per_line=2)
    return out.select(
        "doc_id",
        "n_lines_removed",
        F.substring(F.md5(F.col("text")), 1, 16).alias("fp"),
    )


_q(
    "line_dedup",
    _line_dedup,
    """WITH d2 AS (
  SELECT doc_id,
         'shared header line' || chr(10) || text || chr(10) ||
         CASE WHEN doc_id % 3 = 0 THEN 'common footer'
              ELSE 'footer ' || CAST(doc_id AS VARCHAR) END AS t
  FROM documents
),
split AS (SELECT doc_id, t, string_split(t, chr(10)) AS ls FROM d2),
ln AS (
  SELECT doc_id, u.i AS pos, ls[u.i] AS line
  FROM split, unnest(generate_series(1, len(ls))) AS u(i)
),
bad AS (
  SELECT line FROM ln WHERE trim(line) <> ''
  GROUP BY line HAVING count(DISTINCT doc_id) > 2
),
kept AS (
  SELECT doc_id, pos, line FROM ln WHERE line NOT IN (SELECT line FROM bad)
),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS t2,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d2.doc_id AS doc_id,
       CAST(len(string_split(d2.t, chr(10))) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_lines_removed,
       substr(md5(coalesce(reb.t2, '')), 1, 16) AS fp
FROM d2 LEFT JOIN reb ON reb.doc_id = d2.doc_id""",
)


# --- document chunking + sequence packing -------------------------------------
_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24  # chunk_size - overlap(8)
_PACK_BUDGET = 512  # tokens per training bin


def _doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence shaping, one labeled union (r11 rotation: the pack half
    gives `curation.pack_sequences`' sequential applyInPandas bin state a
    full hash oracle — the kernel class where silent drift hides):

    - ``chunk``: overlapping token-window chunking (size 32, overlap 8) —
      the pre-tokenization split a training/RAG pipeline feeds the embedder.
    - ``pack``: greedy first-fit token packing into 512-token bins per
      source (doc_id order) — the batch-construction step; the oracle
      replays the identical fold as a recursive CTE."""
    from sydradb_spark.pipeline import curation

    docs = load_table(spark, sf_dir, "documents")
    ch = text.chunk_documents(
        docs, chunk_size=_CHUNK_SIZE, overlap=_CHUNK_SIZE - _CHUNK_STRIDE
    ).select(
        F.lit("chunk").alias("part"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("i1"),
        F.col("chunk_start").cast("long").alias("i2"),
        F.col("chunk_text").alias("s"),
        F.col("n_chunk_tokens").cast("long").alias("n"),
    )
    pk = curation.pack_sequences(docs, budget=_PACK_BUDGET).select(
        F.lit("pack").alias("part"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("bin_id").cast("long").alias("i1"),
        F.col("bin_fill").cast("long").alias("i2"),
        F.col("grp").alias("s"),
        F.col("n_tokens").cast("long").alias("n"),
    )
    return ch.unionByName(pk)


_q(
    "doc_chunking",
    _doc_chunking,
    f"""WITH RECURSIVE {_TOKS},
par AS (SELECT doc_id, tk, len(tk) AS n FROM toks WHERE len(tk) > 0),
st AS (
  SELECT doc_id, tk, n,
         CASE WHEN n <= {_CHUNK_SIZE} THEN 0
              ELSE ((n - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE}) * {_CHUNK_STRIDE}
         END AS smax
  FROM par
),
ch AS (
  SELECT doc_id, tk, n, u.i AS s
  FROM st, unnest(generate_series(0, smax, {_CHUNK_STRIDE})) AS u(i)
),
ordered AS (
  SELECT d.source AS grp, d.doc_id,
         CAST(len(t.tk) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rn
  FROM documents d JOIN toks t ON t.doc_id = d.doc_id
),
walk AS (
  SELECT grp, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.grp, o.doc_id, o.n_tokens, o.rn,
         CASE WHEN w.bin_fill + o.n_tokens > {_PACK_BUDGET}
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.bin_fill + o.n_tokens > {_PACK_BUDGET}
              THEN o.n_tokens ELSE w.bin_fill + o.n_tokens END
  FROM walk w JOIN ordered o ON o.grp = w.grp AND o.rn = w.rn + 1
)
SELECT 'chunk' AS part, doc_id,
       CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS i1,
       CAST(s AS BIGINT) AS i2,
       array_to_string(list_slice(tk, s + 1, s + {_CHUNK_SIZE}), ' ') AS s,
       CAST(least(n - s, {_CHUNK_SIZE}) AS BIGINT) AS n
FROM ch
UNION ALL
SELECT 'pack', doc_id, bin_id, bin_fill, grp, n_tokens FROM walk""",
)


# --- funnel + cohort retention (events axis) ----------------------------------
_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_WITHIN = 3600.0
_RET_BUCKET = 7 * 86400


def _funnel_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel stages + step rollup + cohort retention, one labeled union
    (events axis; r8 verdict item 1).

    - ``stage``: per-user deepest funnel stage through view→click→purchase
      with ≤1h per-step gaps (exact restart-safe DP, `events.funnel_stages`)
      plus t_first/t_last. The timestamps are copied event epochs — no
      cross-engine arithmetic — so they carry no float stabilizer.
    - ``funnel``: users reaching ≥ step i. Derived from the SAME stage
      frame (``events.funnel`` is pinned equal to exactly this fold in
      tests/test_pipeline.py), so the Arrow DP kernel runs once per gate.
    - ``retention``: weekly-cohort activity counts
      (`events.retention_cohorts`).
    """
    from sydradb_spark.pipeline import events as ev_ops

    ev = load_table(spark, sf_dir, "events")
    # eager checkpoint (r15): the ``stage`` part and the ``funnel`` rollup
    # both consume this frame — as two union branches they each re-ran the
    # whole per-user DP subtree (the r15 before-plan shows the
    # ArrowEvalPython kernel + its groupBy twice; exchange reuse only
    # dedups the shuffle, not the post-shuffle aggregate + Python kernel).
    # The frame is one row per user, so the materialization is tiny and the
    # DP chain runs once per query invocation. Output unchanged. LAZY
    # checkpoint: no separate up-front job — the persist underneath dedups
    # the subtree across the union branches inside the entry's one action
    # (A/B in OPTIMIZATION_r15.md: lazy ≤ eager ≤ none).
    st = ev_ops.funnel_stages(ev, _FUNNEL_STEPS, _FUNNEL_WITHIN).localCheckpoint(
        eager=False
    )
    stages = st.select(
        F.lit("stage").alias("part"),
        F.col("user").cast("long").alias("k1"),
        F.col("stage").cast("long").alias("k2"),
        F.lit(None).cast("long").alias("n"),
        F.col("t_first").alias("x1"),
        F.col("t_last").alias("x2"),
    )
    k = len(_FUNNEL_STEPS)
    sums = st.agg(
        *[
            F.sum((F.col("stage") >= i + 1).cast("long")).alias(f"__s{i}")
            for i in range(k)
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("i"),
                F.coalesce(F.col(f"__s{i}"), F.lit(0)).alias("n"),
            )
            for i in range(k)
        ]
    )
    fr = sums.select(F.explode(pairs).alias("r")).select(
        F.lit("funnel").alias("part"),
        F.col("r.i").cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.col("r.n").alias("n"),
        F.lit(None).cast("double").alias("x1"),
        F.lit(None).cast("double").alias("x2"),
    )
    ret = ev_ops.retention_cohorts(ev, bucket_seconds=_RET_BUCKET).select(
        F.lit("retention").alias("part"),
        F.col("cohort").alias("k1"),
        F.col("age").alias("k2"),
        F.col("n_users").alias("n"),
        F.lit(None).cast("double").alias("x1"),
        F.lit(None).cast("double").alias("x2"),
    )
    return stages.unionByName(fr).unionByName(ret)


def _funnel_retention_oracle() -> str:
    # The reach CTEs are the feasible-SET formulation of the funnel DP:
    # stage-i reachable at ts iff a step-i event at ts has SOME reachable
    # stage-(i-1) timestamp t with t < ts <= t + within — exactly the
    # independent oracle tests/test_pipeline.py pins funnel_stages against.
    w = _FUNNEL_WITHIN
    s1, s2, s3 = _FUNNEL_STEPS
    b = _RET_BUCKET
    return f"""WITH ev AS (
  SELECT user_id AS u, epoch(ts) AS ts, event_type AS ty
  FROM events WHERE event_type IN ('{s1}', '{s2}', '{s3}')
),
r1 AS (SELECT DISTINCT u, ts FROM ev WHERE ty = '{s1}'),
r2 AS (SELECT DISTINCT e.u, e.ts FROM ev e
       JOIN r1 p ON p.u = e.u AND p.ts < e.ts AND e.ts <= p.ts + {w}
       WHERE e.ty = '{s2}'),
r3 AS (SELECT DISTINCT e.u, e.ts FROM ev e
       JOIN r2 p ON p.u = e.u AND p.ts < e.ts AND e.ts <= p.ts + {w}
       WHERE e.ty = '{s3}'),
m1 AS (SELECT u, min(ts) AS t0, max(ts) AS mx FROM r1 GROUP BY u),
m2 AS (SELECT u, max(ts) AS mx FROM r2 GROUP BY u),
m3 AS (SELECT u, max(ts) AS mx FROM r3 GROUP BY u),
stages AS (
  SELECT d.u,
         CASE WHEN m3.u IS NOT NULL THEN 3
              WHEN m2.u IS NOT NULL THEN 2
              WHEN m1.u IS NOT NULL THEN 1 ELSE 0 END AS stage,
         m1.t0 AS t_first,
         CASE WHEN m3.u IS NOT NULL THEN m3.mx
              WHEN m2.u IS NOT NULL THEN m2.mx
              WHEN m1.u IS NOT NULL THEN m1.mx END AS t_last
  FROM (SELECT DISTINCT u FROM ev) d
  LEFT JOIN m1 ON m1.u = d.u
  LEFT JOIN m2 ON m2.u = d.u
  LEFT JOIN m3 ON m3.u = d.u
),
rb AS (SELECT DISTINCT user_id AS u,
              CAST(floor(epoch(ts) / {b}) * {b} AS BIGINT) AS bkt
       FROM events),
fc AS (SELECT u, min(bkt) AS cohort FROM rb GROUP BY u)
SELECT 'stage' AS part, u AS k1, CAST(stage AS BIGINT) AS k2,
       CAST(NULL AS BIGINT) AS n, t_first AS x1, t_last AS x2 FROM stages
UNION ALL
SELECT 'funnel', CAST(g.i AS BIGINT), CAST(NULL AS BIGINT),
       (SELECT count(*) FROM stages WHERE stage >= g.i),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM generate_series(1, 3) AS g(i)
UNION ALL
SELECT 'retention', fc.cohort, CAST((rb.bkt - fc.cohort) / {b} AS BIGINT),
       count(DISTINCT rb.u), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM rb JOIN fc ON rb.u = fc.u GROUP BY 1, 2, 3"""


_q("funnel_retention", _funnel_retention, _funnel_retention_oracle)


# --- vocabulary sweep + coverage + bigram-LM scoring (corpus axis) ------------
_VOCAB_N = 200


def _vocab_lm_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vocab_topk + token_coverage + lm_score_docs, one labeled union
    (r8 verdict item 1):

    - ``vocab``: the corpus's top-200 tokens with deterministic
      tie-broken ranks (TakeOrderedAndProject, plan-asserted in pytest);
    - ``coverage``: fraction of token occurrences covered by that
      vocabulary (single pass, broadcast vocab);
    - ``lm``: per-doc mean bigram log-probability under the corpus-trained
      add-alpha LM (stabilized 9dp→6dp rounding inside lm_score_docs).
    """
    docs = load_table(spark, sf_dir, "documents")
    # r16 (supersedes the r15 200-row vocab checkpoint): the token-COUNTS
    # table is the real share point — the ``vocab`` branch is a top-k over
    # it and the ``coverage`` branch's totals are integer SUMS over it
    # (occurrences of token t = its count), so deriving coverage from the
    # checkpointed counts removes the branch's whole corpus
    # tokenize+explode pass (guide §2.4). The persist is Zipf-bounded
    # (distinct tokens), not corpus-bounded; values are exactly equal —
    # integer sums — pinned by test_token_coverage_from_counts_matches_stream
    # and the unchanged DuckDB twin.
    counts = (
        text.word_freq_table(docs)
        .select(F.col("word").alias("token"), F.col("freq").alias("count"))
        .localCheckpoint(eager=False)
    )
    vocab = text.vocab_topk_from_counts(counts, n=_VOCAB_N)
    v = vocab.select(
        F.lit("vocab").alias("part"),
        F.col("token").alias("k"),
        F.col("count").alias("a"),
        F.col("rank").alias("b"),
        F.lit(None).cast("double").alias("x"),
    )
    cov = text.token_coverage_from_counts(counts, vocab.select("token")).select(
        F.lit("coverage").alias("part"),
        F.lit(None).cast("string").alias("k"),
        F.col("total_tokens").alias("a"),
        F.col("covered_tokens").alias("b"),
        F.col("coverage").alias("x"),
    )
    # r15: the scorer joins the model table twice ((w1,w2) probs and (w1)
    # totals) — un-materialized, the bigram-count chain ran once per join
    # side. The model is Zipf-bounded (distinct bigrams), so checkpointing
    # it is small; the corpus-side bigram explode still streams once.
    # Lazy for the same no-up-front-job reason as the vocab checkpoint.
    lm = text.train_bigram_lm(docs).localCheckpoint(eager=False)
    sc = text.lm_score_docs(docs, lm).select(
        F.lit("lm").alias("part"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("n_bigrams").alias("a"),
        F.lit(None).cast("long").alias("b"),
        F.col("avg_logprob").alias("x"),
    )
    return v.unionByName(cov).unionByName(sc)


def _vocab_lm_oracle() -> str:
    a, vs = 0.4, 100_000
    return f"""WITH {_TOKS},
c AS (SELECT u.t AS token, count(*) AS cnt FROM toks, unnest(tk) AS u(t) GROUP BY 1),
top AS (SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
        FROM c ORDER BY cnt DESC, token LIMIT {_VOCAB_N}),
alltok AS (SELECT u.t AS token FROM toks, unnest(tk) AS u(t)),
cov AS (SELECT count(*) AS total,
               sum(CASE WHEN token IN (SELECT token FROM top) THEN 1 ELSE 0 END) AS covered
        FROM alltok),
bg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
       FROM toks, unnest(generate_series(1, greatest(len(tk) - 1, 0))) AS g(i)),
model AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
uni AS (SELECT w1, sum(c12) AS c1 FROM model GROUP BY 1),
lp AS (SELECT b.doc_id, ln(m.c12 + {a}) - ln(u.c1 + {a * vs}) AS lp
       FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
                 JOIN uni u ON b.w1 = u.w1),
per AS (SELECT doc_id, count(*) AS nbg, {_O}avg(lp){_C} AS alp FROM lp GROUP BY 1)
SELECT 'vocab' AS part, token AS k, cnt AS a, CAST(rnk AS BIGINT) AS b,
       CAST(NULL AS DOUBLE) AS x FROM top
UNION ALL
SELECT 'coverage', CAST(NULL AS VARCHAR), total, CAST(covered AS BIGINT),
       round(CAST(covered AS DOUBLE) / total, 6) FROM cov
UNION ALL
SELECT 'lm', CAST(d.doc_id AS VARCHAR), coalesce(p.nbg, 0),
       CAST(NULL AS BIGINT), p.alp
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id"""


_q("vocab_lm_coverage", _vocab_lm_coverage, _vocab_lm_oracle)


