"""Input-sampled certification twin (round 8, VERDICT item 5).

The sf10 holdout entries are blocked on ORACLE cost, not engine cost:
their DuckDB twins are super-linear in the corpus (near_dup_scores'
pair set grows ~quadratically in this tiny-vocab corpus — 21M pairs at
sf1, ~2B at sf10 — and the recursive-CTE closures walk those pairs), so
a full-exactness run at the third decade is infeasible for ANY oracle,
not just ours. This script builds the stratified-sample twin that makes
the comparison tractable while keeping sf10's data characteristics:

- ``documents`` / ``embeddings`` are hash-sampled deterministically
  (``hash(id) % mod == 0``) — every replica family and cluster
  contributes members (the hash is id-uniform across replicas), so the
  sample keeps the 100x twin's replica structure, vocabulary, and noise
  geometry rather than degrading to a re-run of sf1;
- every other table is symlinked to the base dir unchanged — entries
  not on the documents/embeddings axis see full-sf10 inputs.

Both engines then read the SAME sampled parquet, so the gate comparison
stays exact (rows + schema + values); what is weakened is only the
corpus size the super-linear oracle has to close over. Engine-side cost
at FULL sf10 is separately covered by BENCH_sf10 (the bench runs the
engine alone). SCALE_NOTES records which entries carry full-input vs
sampled-input third-decade rows.

Usage: python scripts/sample_sf.py --base .scratch/sf10 \
    --out .scratch/sf10s [--doc-mod 10] [--vec-mod 4]
"""

from __future__ import annotations

import argparse
import os

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=".scratch/sf10")
    ap.add_argument("--out", default=".scratch/sf10s")
    ap.add_argument("--doc-mod", type=int, default=10)
    ap.add_argument("--vec-mod", type=int, default=4)
    # events sampling (round 10, sf100 events axis): keep a leading TIME
    # SLICE of the window instead of hash-thinning rows — the fourth
    # decade's defining property is per-second DENSITY (0.77 rows/series/s,
    # 23.5M same-second tie groups), which a row sample would destroy but a
    # shorter window preserves exactly. Used for entries whose DuckDB twin
    # is super-linear in the row count (align_asof_ratio's as-of
    # construction spilled >70 GB of temp at 100M rows); both engines read
    # the same sliced parquet so the gate comparison stays exact.
    ap.add_argument("--event-days", type=float, default=0.0)
    args = ap.parse_args()
    import duckdb

    con = duckdb.connect()
    os.makedirs(args.out, exist_ok=True)
    for t in TABLES:
        src = os.path.abspath(f"{args.base}/{t}.parquet")
        dst = f"{args.out}/{t}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        if t == "documents":
            con.sql(
                f"COPY (SELECT * FROM '{src}' WHERE hash(doc_id) % {args.doc_mod} = 0 "
                f"ORDER BY doc_id) TO '{dst}' (FORMAT PARQUET)"
            )
        elif t == "events" and args.event_days > 0:
            cut = int(args.event_days * 86400)
            con.sql(
                f"COPY (SELECT * FROM '{src}' WHERE "
                f"epoch(ts) < (SELECT min(epoch(ts)) FROM '{src}') + {cut} "
                f"ORDER BY event_id) TO '{dst}' (FORMAT PARQUET)"
            )
        elif t == "embeddings":
            con.sql(
                f"COPY (SELECT * FROM '{src}' WHERE hash(vec_id) % {args.vec_mod} = 0 "
                f"ORDER BY vec_id) TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(src, dst)
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
