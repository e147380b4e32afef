"""Distributed byte-pair-encoding: train a merge list on a corpus, encode
documents with it — the tokenizer-construction step of a training-data
pipeline, done with Spark shapes that survive 100 TB.

Scale design (the standard BPE-trainer factorization):
- The corpus collapses FIRST to the distinct-word frequency table (one
  combining `groupBy(word)`), and everything after runs on that table —
  Zipf-bounded (~10M rows for web-scale corpora), not corpus-bounded.
- Each merge round is one partial-aggregating `groupBy(pair)` over the
  word table's adjacent symbol pairs plus a 1-row argmax collect (the
  driver only ever sees the winning pair), then a narrow per-row merge
  rewrite. Rounds are sequential by definition of BPE; cost is
  n_merges × O(word-table), independent of corpus size.
- `localCheckpoint` every few rounds keeps the lineage flat (same
  discipline as connected components).
- Encoding joins documents' words against the (small, broadcast) trained
  vocabulary: unseen words fall back to applying the merges directly via
  an Arrow-batched kernel (sequential merge application is the legitimate
  pandas-UDF case, and it touches only the unseen-word MINORITY).

Determinism: ties on pair frequency break lexicographically, so the merge
list is a pure function of the corpus — retries and re-runs reproduce it
exactly (pinned against a pure-Python reference implementation in tests).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, standard BPE


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the corpus's distinct-word frequencies; the ONLY
    corpus-wide pass the trainer makes. Shared with `text.vocab_topk`."""
    from sydradb_spark.pipeline.text import word_freq_table as _wft

    return _wft(docs, text_col)


def _pairs_col(syms):
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _merge_col(syms, left, right):
    """Replace every non-overlapping left,right adjacency (leftmost-first)
    with the concatenation — expressed as a fold over the symbol array."""
    zero = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc, s):
        prev = F.element_at(acc["out"], -1)
        can = (
            (~acc["skip"])
            & (F.size(acc["out"]) > 0)
            & (prev == F.lit(left))
            & (s == F.lit(right))
        )
        merged = F.concat(
            F.slice(acc["out"], 1, F.size(acc["out"]) - 1),
            F.array(F.concat(prev, s)),
        )
        return F.when(
            can, F.struct(merged.alias("out"), F.lit(True).alias("skip"))
        ).otherwise(
            F.struct(
                F.concat(acc["out"], F.array(s)).alias("out"),
                F.lit(False).alias("skip"),
            )
        )

    return F.aggregate(syms, zero, step, lambda acc: acc["out"])


def _select_disjoint(
    candidates: list[tuple[str, int]], m: int
) -> list[tuple[str, str]]:
    """Greedy top-m SYMBOL-DISJOINT pair selection from (pair, count) rows
    already sorted by (count desc, pair asc): a pair is taken only when
    neither of its symbols — NOR its concatenated output — collides with an
    already-taken pair's symbols or output, and neither of its symbols is an
    already-taken pair's output. The output check matters: a batch like
    [('a','b'), ('x','ab')] is symbol-disjoint yet NOT independent — the
    chained single-pass rewrite would merge 'x' with 'ab' tokens the round's
    count never saw. Even with these checks the batch is applied by ONE
    sequential rewrite pass, so taken merges can't consume each other's
    inputs or outputs; batched selection remains the standard frequency-
    greedy approximation vs per-merge recounting (see bpe_train)."""
    taken: list[tuple[str, str]] = []
    used: set[str] = set()  # symbols consumed by taken pairs
    produced: set[str] = set()  # outputs created by taken pairs
    for p, _c in candidates:
        left, right = p.split(" ")
        out = left + right
        if (
            left in used
            or right in used
            or left in produced
            or right in produced
            or out in used
            or out in produced
        ):
            continue
        taken.append((left, right))
        used.update((left, right))
        produced.add(out)
        if len(taken) >= m:
            break
    return taken


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    batch_size: int = 1,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list. Stops early when no adjacent pair repeats.

    ``batch_size=1`` is EXACT classic BPE (argmax → rewrite → recount;
    ties break lexicographically, pinned against the pure-Python reference
    in tests). ``batch_size=m>1`` is the standard distributed-BPE batching:
    each round takes the top-m symbol-disjoint pairs from ONE pair count
    and applies them in one rewrite, cutting driver-sequential Spark jobs
    from n_merges to ~n_merges/m — the difference that makes a GPT-2-class
    50k-merge vocabulary feasible (measured at sf0.1: 1.30 s/merge
    sequential ≈ 18 h for 50k, vs 0.21 s/merge at m=32 ≈ 3 h;
    SCALE_NOTES r11). Batched selection is exact whenever the top-m pairs
    are disjoint AND no pair formed by an earlier merge would out-rank a
    later one (asserted in tests on a corpus where that holds); on natural
    text it is the usual frequency-greedy APPROXIMATION — a cascade merge
    like (a,b)→(ab,c) defers at least one round because the merged token
    does not exist in the round's count, so the merge ORDER differs from
    classic BPE and, at small vocabulary budgets, so does part of the
    trained set (sf0.01, 64 merges: token-set overlap 51/64 at m=4,
    29/64 at m=32 — fidelity decreases with m, converges with budget).
    The result is still a deterministic, valid merge list; use moderate m
    (4–8) when closeness to classic BPE matters, larger m when round
    count dominates — and when EXACT classic BPE is required at scale,
    use ``bpe_train_local`` (one word-count job + in-memory incremental
    training; measured 3.2 s for the full sf0.1 run that extrapolates to
    ~18 h through this per-merge-job loop)."""
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    wf = word_freq_table(docs, text_col)
    chars = F.filter(F.split(F.col("word"), ""), lambda c: F.length(c) > 0)
    syms = F.concat(chars, F.array(F.lit(END)))  # chars + end marker
    table = wf.select("freq", syms.alias("syms")).localCheckpoint()
    merges: list[tuple[str, str]] = []
    since_checkpoint = 0
    while len(merges) < n_merges:
        m = min(batch_size, n_merges - len(merges))
        # collect a candidate window wide enough to find m disjoint pairs;
        # the driver sees at most this many rows per round, never the table
        window = m if m == 1 else max(4 * m, m + 16)
        cand = (
            table.select("freq", F.explode(_pairs_col(F.col("syms"))).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("c"))
            .where(F.col("c") >= 2)
            .orderBy(F.col("c").desc(), F.col("p"))
            .limit(window)
            .collect()
        )
        batch = _select_disjoint([(r["p"], r["c"]) for r in cand], m)
        if not batch:
            break
        merges.extend(batch)
        col = F.col("syms")
        for left, right in batch:
            col = _merge_col(col, left, right)
        table = table.select("freq", col.alias("syms"))
        since_checkpoint += len(batch)
        if since_checkpoint >= 8:
            table = table.localCheckpoint()
            since_checkpoint = 0
    return merges


def bpe_train_local(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 20_000_000,
) -> list[tuple[str, str]]:
    """EXACT classic BPE at corpus scale: ONE distributed job (the
    combining word-frequency groupBy — the only corpus-wide pass), then
    in-memory training on the collapsed word table with incremental
    pair-count deltas and a lazy max-heap. This is the standard
    industrial trainer shape: the word table is VOCABULARY-bounded
    (Zipf: ~10M distinct words for web-scale corpora ≈ a few hundred MB
    on the driver), so pulling it is a schema-bounded collect, not a
    corpus-sized one, and each merge costs O(words containing the pair)
    instead of a full Spark job — 50k merges run in driver minutes where
    the per-merge-job loop (``bpe_train`` batch_size=1) needs ~18 h and
    the batched loop trades exactness for rounds.

    Bit-equal to ``bpe_train(batch_size=1)`` — same (count desc, pair
    asc) tie-break, same leftmost-nonoverlapping rewrite, same >= 2
    stop — pinned by tests on reference and random corpora.

    ``max_words`` caps driver memory: corpora whose DISTINCT-word count
    exceeds it train on the top-``max_words`` by (freq desc, word),
    which drops only hapax-class tail mass (each dropped word has lower
    frequency than every kept one); exactness is guaranteed when the
    vocabulary fits, which it does by orders of magnitude at the 10M
    design point."""
    import heapq
    from collections import Counter, defaultdict

    rows = (
        word_freq_table(docs, text_col)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    words: list[list[str]] = [list(r["word"]) + [END] for r in rows]
    freqs: list[int] = [int(r["freq"]) for r in rows]

    pair_count: Counter = Counter()
    occ: dict = defaultdict(set)  # pair -> indices of words containing it
    for i, (syms, f) in enumerate(zip(words, freqs)):
        for p in zip(syms, syms[1:]):
            pair_count[p] += f
            occ[p].add(i)
    # lazy-deletion max-heap keyed (count desc, "l r" asc); entries go
    # stale when a count changes — pop-verify against pair_count
    heap = [(-c, f"{p[0]} {p[1]}", p) for p, c in pair_count.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        best = None
        while heap:
            negc, _pstr, p = heapq.heappop(heap)
            if pair_count.get(p, 0) == -negc and -negc >= 2:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        left, right = best
        for i in sorted(occ[best]):
            syms, f = words[i], freqs[i]
            old = Counter(zip(syms, syms[1:]))
            new_syms = _apply_merges_one(syms, left, right)
            new = Counter(zip(new_syms, new_syms[1:]))
            words[i] = new_syms
            for p, c in (old - new).items():
                pair_count[p] -= c * f
                if pair_count[p] <= 0:
                    pair_count.pop(p, None)
                if p not in new:
                    occ[p].discard(i)
                if p in pair_count:
                    heapq.heappush(heap, (-pair_count[p], f"{p[0]} {p[1]}", p))
            for p, c in (new - old).items():
                pair_count[p] += c * f
                occ[p].add(i)
                heapq.heappush(heap, (-pair_count[p], f"{p[0]} {p[1]}", p))
        pair_count.pop(best, None)
        occ.pop(best, None)
    return merges


def _apply_merges_one(syms: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END]
    for left, right in merges:
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """(doc_id, tokens array<string>, n_tokens) — encode each document with
    the trained merges. The per-word encoding is computed ONCE per distinct
    word in the batch (Arrow kernel over the distinct-word frame) and
    broadcast-joined back, so the sequential merge loop never touches the
    corpus row count."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    from sydradb_spark.pipeline.text import tokens

    mlist = list(merges)
    end = END

    # the UDF body must be SELF-CONTAINED (locals + worker-importable
    # modules only): referencing the module-level _apply_merges would make
    # cloudpickle serialize it by module path, and the driver-contract
    # session's Python workers cannot import sydradb_spark (the repo is on
    # the DRIVER's sys.path only) — caught by the r12 bare-session check
    @pandas_udf(ArrayType(StringType()))
    def _enc(words: pd.Series) -> pd.Series:
        def apply(word: str) -> list[str]:
            syms = list(word) + [end]
            for left, right in mlist:
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return words.map(lambda w: apply(w) if w else [end])

    from pyspark import StorageLevel

    # exploded feeds BOTH the distinct-word vocab and the join side —
    # persist so the corpus-wide tokenize pass runs once, not twice (same
    # shared-input discipline as the minhash shingle table)
    exploded = docs.select(
        "doc_id", F.posexplode(tokens(F.col(text_col))).alias("pos", "word")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    vocab = exploded.select("word").distinct().select(
        "word", _enc(F.col("word")).alias("toks")
    )
    joined = exploded.join(F.broadcast(vocab), on="word")
    per_doc = joined.groupBy("doc_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                lambda s: s["toks"],
            )
        ).alias("tokens")
    )
    # zero-token docs produce no exploded rows — re-attach them with an
    # empty encoding so the per-document contract holds for every input row
    out = (
        docs.select("doc_id")
        .join(per_doc, on="doc_id", how="left")
        .withColumn(
            "tokens", F.coalesce(F.col("tokens"), F.array().cast("array<string>"))
        )
        .select("doc_id", "tokens", F.size("tokens").cast("long").alias("n_tokens"))
    )
    # eagerly materialize (lineage-truncating localCheckpoint) so the
    # corpus-sized exploded cache can be released NOW instead of leaking
    # for the session lifetime; the checkpointed partitions themselves are
    # reclaimed by the ContextCleaner when the returned frame is dropped
    out = out.localCheckpoint(eager=True)
    exploded.unpersist()
    return out
