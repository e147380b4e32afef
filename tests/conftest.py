from __future__ import annotations

import pytest

from sydradb_spark.model import with_identity
from sydradb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sydradb-tests", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def points(spark):
    """FIXTURES.md §F1-shaped canonical fixture: regular cadence, a gappy
    series, duplicates, out-of-order arrivals, a monotone counter."""
    rows = []
    # weather.room1: 10s cadence over 2h, value = i * 0.5, host=a
    for i in range(720):
        rows.append(("weather.room1", {"host": "a", "env": "prod"}, 1000_000 + i * 10, i * 0.5))
    # weather.room2: gappy — every 60s but missing minutes 10..20
    for i in range(60):
        if 10 <= i < 20:
            continue
        rows.append(("weather.room2", {"host": "b", "env": "prod"}, 1000_000 + i * 60, float(i)))
    # cpu.total: monotone counter, 15s cadence
    for i in range(240):
        rows.append(("cpu.total", {"host": "a", "env": "dev"}, 1000_000 + i * 15, 100.0 + i * 3))
    # duplicates (same series/ts, different value) + out-of-order
    rows.append(("weather.room1", {"host": "a", "env": "prod"}, 1000_050, 999.0))
    rows.append(("cpu.total", {"host": "a", "env": "dev"}, 1000_000, 50.0))
    df = spark.createDataFrame(
        rows, "series string, tags map<string,string>, ts long, value double"
    )
    return with_identity(df).cache()


@pytest.fixture(scope="session")
def engine(spark, points):
    from sydradb_spark.sydraql.engine import SydraQLEngine

    return SydraQLEngine(spark, points)
