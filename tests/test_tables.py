"""Events loader robustness across ts physical shapes (the round-4 lesson:
the driver regenerated events.parquet with a different ts type and every
events query died). Synthesizes each shape and checks ts_s comes out as the
same epoch seconds."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sydradb_spark.tables import _long_ts_units_per_s, load_table

TS_S = [1_704_067_200, 1_704_067_260, 1_704_070_800]  # 2024-01-01 + offsets


def _write(tmpdir: str, name: str, ts_array: pa.Array) -> str:
    d = os.path.join(tmpdir, name)
    os.makedirs(d)
    path = os.path.join(d, "events.parquet")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7, 8, 9], pa.int64()),
            "event_type": pa.array(["click"] * 3),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(t, path)
    return d


@pytest.mark.parametrize(
    "label,unit_factor,pa_type",
    [
        ("ts_us", 1_000_000, pa.timestamp("us")),
        ("ts_ns", 1_000_000_000, pa.timestamp("ns")),
        ("long_s", 1, pa.int64()),
        ("long_ms", 1_000, pa.int64()),
        ("long_us", 1_000_000, pa.int64()),
        ("long_ns", 1_000_000_000, pa.int64()),
    ],
)
def test_events_ts_shapes(spark, tmp_path, label, unit_factor, pa_type):
    vals = [s * unit_factor for s in TS_S]
    if pa.types.is_timestamp(pa_type):
        arr = pa.array(vals, pa.int64()).cast(pa_type)
    else:
        arr = pa.array(vals, pa_type)
    d = _write(str(tmp_path), label, arr)
    df = load_table(spark, d, "events")
    got = sorted(r["ts_s"] for r in df.select("ts_s").collect())
    assert got == TS_S, f"{label}: {got}"


def test_footer_unit_inference(tmp_path):
    for label, ups in [("s", 1), ("ms", 1_000), ("us", 1_000_000), ("ns", 1_000_000_000)]:
        d = _write(
            str(tmp_path), f"u_{label}", pa.array([s * ups for s in TS_S], pa.int64())
        )
        assert _long_ts_units_per_s(os.path.join(d, "events.parquet")) == ups
    # timestamp columns: stats are datetimes → comparison raises → nanos
    d = _write(
        str(tmp_path),
        "u_tsns",
        pa.array([s * 1_000_000_000 for s in TS_S], pa.int64()).cast(
            pa.timestamp("ns")
        ),
    )
    assert _long_ts_units_per_s(os.path.join(d, "events.parquet")) == 1_000_000_000
