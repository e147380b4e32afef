"""Semi-structured (JSON string) column profiling — the schema-drift sweep
run before relying on `props`-style columns at scale.

Scale shape: `from_json` to map<string,string> + key explode is a narrow
per-row expansion; the profile is ONE combining `groupBy(key)` whose
cardinality is the number of distinct keys (schema-bounded, not
row-bounded). Type classification is a pure column CASE over the value
text, so the whole stage stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INT_RE = r"^-?\d+$"
FLOAT_RE = r"^-?\d+\.\d+([eE][+-]?\d+)?$|^-?\d+[eE][+-]?\d+$"


def json_key_stats(df: DataFrame, col: str) -> DataFrame:
    """(key, n_rows, n_int, n_float, n_bool, n_string, n_null) — how often
    each key appears across a JSON-object string column and what value
    types it carries. Disagreeing type columns ARE the schema-drift signal
    (e.g. a key that is int in 99% of rows and string in the rest).

    Values are classified from their text form (`from_json` to
    map<string,string> renders scalars as their JSON literal text, nested
    objects/arrays as JSON text → classified 'string'). Known limitation of
    this codegen-only path: `from_json` unquotes scalars, so a QUOTED
    number ("1") is indistinguishable from the number 1 and counts as
    n_int — int→numeric-string drift needs a raw-text kernel; int→word,
    int→null, int→float, and presence/absence drift are all visible. Rows
    that are not JSON objects parse to null maps and contribute nothing.
    """
    m = F.from_json(F.col(col), "map<string,string>")
    kv = df.select(F.explode(m).alias("key", "val"))
    is_null = F.col("val").isNull()
    is_bool = F.col("val").isin("true", "false")
    is_int = F.col("val").rlike(INT_RE)
    is_float = F.col("val").rlike(FLOAT_RE)
    return kv.groupBy("key").agg(
        F.count("*").alias("n_rows"),
        F.sum(is_int.cast("long")).alias("n_int"),
        F.sum((~is_int & is_float).cast("long")).alias("n_float"),
        F.sum(is_bool.cast("long")).alias("n_bool"),
        F.sum(
            (~is_null & ~is_bool & ~is_int & ~is_float).cast("long")
        ).alias("n_string"),
        F.sum(is_null.cast("long")).alias("n_null"),
    )
