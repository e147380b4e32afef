"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet dir, then compares
row count, sorted column names, and values (rows sorted lexicographically,
floats compared exactly and with 1e-9 tolerance so ulp-level drift is
visible before the driver sees it).

Usage: python scripts/verify_local.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from sydradb_spark.session import get_spark  # noqa: E402
from sydradb_spark.tables import TABLES  # noqa: E402


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(odf):
        return False, f"rowcount spark={len(sdf)} oracle={len(odf)}"
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    # dtype proxy for the driver's schema check (int32 vs int64 vs float64)
    dtype_notes = []
    for c in sdf.columns:
        a, b = str(sdf[c].dtype), str(odf[c].dtype)
        if a != b and not ({a, b} <= {"object", "bool"} or (len(sdf) == 0)):
            num = {"int32", "int64", "float64", "float32"}
            if a in num and b in num and a != b:
                dtype_notes.append(f"{c}:{a}!={b}")
    if dtype_notes:
        print(f"     DTYPE WARN: {dtype_notes}")
    s, o = canon_frame(sdf), canon_frame(odf)
    worst = 0.0
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            diff = np.where(both_nan, 0.0, np.abs(a - b))
            if np.isnan(diff).any():
                return False, f"null mismatch in {c}"
            m = float(np.max(diff)) if len(diff) else 0.0
            worst = max(worst, m)
            if m > 1e-9 * max(1.0, float(np.nanmax(np.abs(b))) if len(b) else 1.0):
                return False, f"value diff {m} in {c}"
        else:
            eq = (sv.astype(object).where(pd.notna(sv), None)
                  == ov.astype(object).where(pd.notna(ov), None))
            null_eq = pd.isna(sv).to_numpy() & pd.isna(ov).to_numpy()
            if not (eq.to_numpy() | null_eq).all():
                bad = (~(eq.to_numpy() | null_eq)).nonzero()[0][:3]
                return False, f"mismatch in {c} at rows {bad}: {sv.iloc[bad].tolist()} vs {ov.iloc[bad].tolist()}"
    note = f" (max fp diff {worst:.2e})" if worst > 0 else ""
    return True, f"ok rows={len(sdf)}{note}"


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--default-session"]
    default_session = "--default-session" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if default_session:
        # faithful driver simulation: bare session, ANSI on, none of the
        # repo-tuned confs — catches hidden config assumptions
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "verify-default"
        ).getOrCreate()
    else:
        spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # generated oracles (ann_ivf centroid literals) must read the same data
    # the Spark queries run on; the driver itself always compares at sf0.01
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    qs = E.queries()
    # materialize only the requested oracles: generated ones can be
    # super-linear in the twin (all_oracles docstring has the war story)
    from sydradb_spark.contract import all_oracles

    oracles = all_oracles(only=only or set(qs))
    failed = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failed.append(name)
            continue
        good, msg = compare(sdf, odf)
        print(f"{'ok  ' if good else 'FAIL'} {name}: {msg} [{time.time()-t0:.1f}s]")
        if not good:
            failed.append(name)
    print(f"\n{n_run - len(failed)}/{n_run} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
