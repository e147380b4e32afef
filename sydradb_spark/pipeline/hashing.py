"""Deterministic cross-engine hashing for pipeline operators.

All similarity/dedup hashing routes through md5-hex → 60-bit integer so a
DuckDB oracle can reproduce the exact same values:

    Spark : conv(substr(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

xxhash64 would be faster JVM-side but DuckDB cannot compute it; at 100 TB the
md5 cost is per-shingle CPU, still embarrassingly parallel and shuffle-free.
Swap in F.xxhash64 for production runs that don't need the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column) -> Column:
    """60-bit deterministic hash of a string column (md5-prefix based)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_hash64(expr: str) -> str:
    """DuckDB SQL twin of hash64()."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
