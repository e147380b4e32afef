"""Scale-twin generator: build an sfN directory from the driver's sf0.1
tables, preserving each table's statistical shape while multiplying row
counts — the data story behind the sf1 (10x) scaling benchmark.

Replication follows the driver's own observed sf0.01 -> sf0.1 scaling:

- events: 10x rows and 10x users over the SAME 30-day window (the driver
  densifies, it does not widen) — per-hour-bucket loads grow 10x, the
  partition count stays fixed, exactly the ingest-rate scale-up a real
  deployment sees. Replica timestamps shift by k * ~9973.01 s WRAPPED
  modulo the window: the engine's points table has SECOND resolution, so
  a sub-second jitter (the first attempt) collapses into ~10-way
  same-series same-second ties that break first/last and lag/lead
  determinism; a multi-hour prime shift keeps replicas second-distinct
  (same-series same-second tie groups stay at the driver's own ~linear
  level — re-checked after generation) while the wrap preserves the
  window and the uniform density.
- documents: 10x via a per-replica deterministic word map (half the vocab
  gets a replica suffix). Within a replica the map is a bijection applied
  to every doc, so the driver's intentional near/exact-dup pairs are
  PRESERVED per replica (pair volume scales ~linearly, like the driver's
  own 22 -> 228 prefix-dup groups); across replicas 5-gram shingle overlap
  collapses to ~3%, far below every near-dup threshold — replication does
  NOT manufacture quadratic cross-replica dup pairs.
- embeddings: 4x (the driver's own decade step was 500 -> 2000, i.e. 4x),
  replicas perturbed with seeded N(0, 0.05*std) noise so cluster geometry
  survives for IVF/LSH while replicas aren't exact dups. Replica 0 keeps
  the original ids/vectors, so fixed query-id sets still resolve.
- lineitem/orders/customer/supplier/part: 10x with disjoint key offsets
  that keep every foreign key valid within its replica. nation/region:
  dimension tables, copied as-is.

Usage: python scripts/gen_sf.py [--base /root/testdata/sf0.1]
    [--out .scratch/sf1] [--factor 10]
Deterministic — no RNG outside seeded numpy/crc32.

``--skew`` (round 8) builds the Zipf-skew twin on top of the replicated
tables — every scale twin so far was key-uniform, so the skew armor
(drop_hot_keys, hot-bucket oracles, AQE splits, per-user caps) had only
ever seen synthetic unit tests. Three injections, all deterministic:

- events: ~30% of points remapped into ONE series (``events.click``),
  ~40% of rows onto ONE host tag (h0, via user_id floored to %5==0),
  and ~2% of all events onto ONE mega-user (7777777) — the degenerate
  key every per-user window/groupBy has to survive.
- documents: a boilerplate family of ``--skew-docs`` near-identical docs
  (one common template, one word varies per doc) — >LSH_MAX_BUCKET, so
  every banded dedup path (minhash/simhash/winnow) must take its
  hot-bucket guard, and the DuckDB twins must replay the same drop.
- embeddings: ``--skew-vecs`` near-copies of one vector — a degenerate
  sign-LSH bucket and a SemDeDup near-clique in one k-means cell.

TPC-H tables are left uniform: no catalog entry reads them (the gate's
skew coverage lives entirely in events/documents/embeddings).
"""

from __future__ import annotations

import argparse
import os
import zlib


def _word_map(w: str, k: int) -> str:
    if k == 0:
        return w
    return f"{w}r{k}" if (zlib.crc32(f"{w}|{k}".encode()) & 1) else w


def gen_documents(con, base: str, out: str, factor: int, skew_docs: int = 0) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{base}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for k in range(factor):
        for doc_id, text, lang, source in rows:
            t = (
                text
                if k == 0
                else " ".join(_word_map(w, k) for w in (text or "").split(" "))
            )
            doc_ids.append(doc_id + k * 1_000_000)
            texts.append(t)
            langs.append(lang)
            sources.append(source)
            n_chars.append(len(t))
    if skew_docs:
        # boilerplate family: one template (the lowest-id base doc), one
        # word varied per member. Pairwise ≤2 words differ out of ~60, so
        # 5-gram Jaccard ≈ 0.85 — every member is a near-dup of every
        # other, and the family collapses into single (band, sig) LSH
        # buckets of ~skew_docs members: the degenerate key the
        # drop_hot_keys guard exists for. ids from 900M keep clear of
        # every replica offset (k * 1e6).
        template = (rows[0][1] or "").split(" ")
        nw = max(1, len(template))
        for i in range(skew_docs):
            words = list(template)
            words[(i * 7) % nw] = f"bpq{i}"
            t = " ".join(words)
            doc_ids.append(900_000_000 + i)
            texts.append(t)
            langs.append(rows[0][2])
            sources.append("boilerplate")
            n_chars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )


def gen_embeddings(con, base: str, out: str, factor: int, skew_vecs: int = 0) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    # driver's own decade step was 4x — follow it, not the 10x of row tables;
    # factor 1 must stay a true identity run (1x vectors), so no floor above 1
    emb_factor = max(1, round(factor ** 0.6))  # 1 -> 1, 10 -> 4
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{base}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    base_vecs = np.array([r[1] for r in rows], dtype=np.float32)
    std = float(base_vecs.std())
    vec_ids, vecs, labels = [], [], []
    for k in range(emb_factor):
        rng = np.random.RandomState(1234 + k)
        noise = (
            np.zeros_like(base_vecs)
            if k == 0
            else rng.normal(0.0, 0.05 * std, base_vecs.shape).astype(np.float32)
        )
        pert = base_vecs + noise
        for i, (vec_id, _, label) in enumerate(rows):
            vec_ids.append(vec_id + k * 1_000_000)
            vecs.append(pert[i].tolist())
            labels.append(label)
    if skew_vecs:
        # hot cluster: near-copies of the lowest-id base vector (noise at
        # 0.001*std keeps cosine ≥ 0.999 pairwise) — one degenerate
        # sign-LSH bucket (> LSH_MAX_BUCKET ⇒ guard must fire, twin must
        # replay) and one SemDeDup near-clique inside a single k-means
        # cell. ids from 900M, clear of replica offsets.
        rng = np.random.RandomState(4321)
        hot = base_vecs[0]
        noise = rng.normal(0.0, 0.001 * std, (skew_vecs, hot.shape[0])).astype(
            np.float32
        )
        for i in range(skew_vecs):
            vec_ids.append(900_000_000 + i)
            vecs.append((hot + noise[i]).tolist())
            labels.append(rows[0][2])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scratch/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--skew-docs", type=int, default=10_000)
    ap.add_argument("--skew-vecs", type=int, default=1_200)
    # --tables (round 9, sf100): generate only the named axes and symlink
    # the rest from --link-base. At factor 1000 the TPC-H row tables would
    # be 600M rows of parquet no catalog entry reads at that decade — the
    # fourth-decade certification targets the events/documents/embeddings
    # axes only, so the unused tables ride along at link-base scale
    # (recorded as such in SCALE_NOTES).
    ap.add_argument("--tables", default="")
    ap.add_argument("--link-base", default="")
    args = ap.parse_args()
    import duckdb

    base, out, f = args.base, args.out, args.factor
    only = set(t for t in args.tables.split(",") if t)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def want(name: str) -> bool:
        if not only or name in only:
            return True
        if args.link_base:
            src = os.path.abspath(f"{args.link_base}/{name}.parquet")
            dst = f"{out}/{name}.parquet"
            if os.path.lexists(dst):
                os.remove(dst)
            os.symlink(src, dst)
            print(f"{name}: linked from {args.link_base}")
        return False

    def copy(sql: str, name: str) -> None:
        con.sql(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    if want("events"):
        t0_us, t1_us = con.sql(
            f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM '{base}/events.parquet'"
        ).fetchone()
        w_us = (t1_us - t0_us) + 1_000_000
        # prime multi-hour shift (+13017 us so the microsecond layer is also
        # replica-unique), wrapped so the window and density are preserved
        shift = 9973 * 1_000_000 + 13_017
        ev_sql = (
            f"SELECT e.event_id + r.k*1000000000 AS event_id, "
            f"make_timestamp({t0_us} + ((epoch_us(e.ts) - {t0_us}) + r.k*{shift}) % {w_us}) AS ts, "
            f"e.user_id + r.k*100000 AS user_id, e.event_type, e.value, e.props "
            f"FROM '{base}/events.parquet' e, range({f}) r(k)"
        )
        if args.skew:
            # Zipf-skew remaps over the replicated rows, each keyed by an
            # independent hash of the (replica-unique) event_id so the three
            # injections are uncorrelated and fully deterministic:
            # - 12% of ALL rows become events.click => click holds ~30% of
            #   points (12 + 88*0.2) — the hot series;
            # - 25% of rows get user_id floored to %5==0 => host tag h0
            #   carries ~40% of rows — the hot tag;
            # - 2% of rows collapse onto ONE user (7777777, clear of every
            #   replica offset) — the mega-user every per-user window must
            #   survive. Mega-user wins over the tag remap where both hit.
            ev_sql = (
                "SELECT event_id, ts, "
                "CASE WHEN hash(event_id + 2) % 100 < 2 THEN 7777777 "
                "     WHEN hash(event_id + 1) % 100 < 25 THEN user_id - (user_id % 5) "
                "     ELSE user_id END AS user_id, "
                "CASE WHEN hash(event_id) % 100 < 12 THEN 'click' "
                "     ELSE event_type END AS event_type, "
                f"value, props FROM ({ev_sql})"
            )
        copy(ev_sql, "events")
        if args.skew:
            hot = con.sql(
                f"""SELECT event_type, count(*)::DOUBLE / sum(count(*)) OVER () AS share
                     FROM '{out}/events.parquet' GROUP BY 1 ORDER BY 2 DESC"""
            ).fetchall()
            mega = con.sql(
                f"SELECT count(*) FROM '{out}/events.parquet' WHERE user_id = 7777777"
            ).fetchone()[0]
            h0 = con.sql(
                f"""SELECT count(*) FILTER (user_id % 5 = 0)::DOUBLE / count(*)
                     FROM '{out}/events.parquet'"""
            ).fetchone()[0]
            print(
                f"skew: top series {hot[0][0]} {hot[0][1]:.1%}, host h0 {h0:.1%}, "
                f"mega-user events {mega}"
            )
        ties = con.sql(
            f"""SELECT count(*) FROM (
                  SELECT event_type, user_id%5, user_id%2, epoch(ts)::BIGINT, count(*)
                  FROM '{out}/events.parquet' GROUP BY 1,2,3,4 HAVING count(*)>1)"""
        ).fetchone()[0]
        base_ties = con.sql(
            f"""SELECT count(*) FROM (
                  SELECT event_type, user_id%5, user_id%2, epoch(ts)::BIGINT, count(*)
                  FROM '{base}/events.parquet' GROUP BY 1,2,3,4 HAVING count(*)>1)"""
        ).fetchone()[0]
        # Same-second ties are BIRTHDAY COLLISIONS of the second-resolution
        # points table: ~n^2/(2*window_s) per series, so densifying 10x grows
        # them ~100x no matter how replicas are spread — the driver's own sf1
        # would look the same. The engine is tie-DETERMINISTIC (first/last/
        # delta/rate break ts ties by value; lag/lead derive one canonical
        # order), so ties are data to serve correctly, not a generation bug.
        # This print is the visibility check that growth matches the birthday
        # estimate rather than an accidental systematic collision.
        n_base = con.sql(
            f"SELECT count(*) FROM '{base}/events.parquet'"
        ).fetchone()[0]
        est = (n_base * f) ** 2 / (2 * (w_us / 1e6)) / 50  # 50 series
        print(
            f"same-series same-second tie groups: {ties} (base {base_ties}, "
            f"birthday estimate ~{est:.0f})"
        )
    if want("lineitem"):
        copy(
            f"SELECT l.l_orderkey + r.k*1000000000 AS l_orderkey, "
            f"l.l_partkey + r.k*100000 AS l_partkey, "
            f"l.l_suppkey + r.k*10000 AS l_suppkey, l.l_linenumber, l.l_quantity, "
            f"l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag, "
            f"l.l_linestatus, l.l_shipdate "
            f"FROM '{base}/lineitem.parquet' l, range({f}) r(k)",
            "lineitem",
        )
    if want("orders"):
        copy(
            f"SELECT o.o_orderkey + r.k*1000000000 AS o_orderkey, "
            f"o.o_custkey + r.k*1000000 AS o_custkey, o.o_orderstatus, "
            f"o.o_totalprice, o.o_orderdate, o.o_orderpriority "
            f"FROM '{base}/orders.parquet' o, range({f}) r(k)",
            "orders",
        )
    if want("customer"):
        copy(
            f"SELECT c.c_custkey + r.k*1000000 AS c_custkey, c.c_name, "
            f"c.c_nationkey, c.c_acctbal, c.c_mktsegment "
            f"FROM '{base}/customer.parquet' c, range({f}) r(k)",
            "customer",
        )
    if want("supplier"):
        copy(
            f"SELECT s.s_suppkey + r.k*10000 AS s_suppkey, s.s_name, "
            f"s.s_nationkey, s.s_acctbal "
            f"FROM '{base}/supplier.parquet' s, range({f}) r(k)",
            "supplier",
        )
    if want("part"):
        copy(
            f"SELECT p.p_partkey + r.k*100000 AS p_partkey, p.p_name, p.p_brand, "
            f"p.p_type, p.p_size, p.p_retailprice "
            f"FROM '{base}/part.parquet' p, range({f}) r(k)",
            "part",
        )
    if want("nation"):
        copy(f"SELECT * FROM '{base}/nation.parquet'", "nation")
    if want("region"):
        copy(f"SELECT * FROM '{base}/region.parquet'", "region")
    if want("documents"):
        gen_documents(con, base, out, f, args.skew_docs if args.skew else 0)
        print("documents: done")
    if want("embeddings"):
        gen_embeddings(con, base, out, f, args.skew_vecs if args.skew else 0)
        print("embeddings: done")


if __name__ == "__main__":
    main()
