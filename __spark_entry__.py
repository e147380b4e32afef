"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The catalog lives in ``sydradb_spark.contract`` (core sydraQL surface,
LLM-pipeline operators, lifecycle ops); this file is the stable façade.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sydradb_spark.contract import all_oracles, all_queries  # noqa: E402
from sydradb_spark.contract.base import T0, T1, r6  # noqa: E402
from sydradb_spark.sydraql.engine import SydraQLEngine  # noqa: E402
from sydradb_spark.tables import events_points  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7.1): every reference
    plan-node type — scan, filter, aggregate (grouped), sort, limit."""
    eng = SydraQLEngine(spark, events_points(spark, "/root/testdata/sf0.001"))
    return eng.query(
        f"select time_bucket(3600, time) as bucket, {r6('avg(value)')} as avg_v, "
        f"count() as n from events.click where time >= {T0} and time < {T1} "
        f"group by time_bucket(3600, time) order by bucket limit 100"
    ).df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ pipeline ops).

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    """
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL twin for each ``queries()`` key (tables pre-registered as
    views). Keys without an oracle (e.g. ema's pandas UDF) get the driver's
    weaker rows-only check."""
    return all_oracles()
