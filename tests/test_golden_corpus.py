"""Golden sydraQL corpus (FIXTURES.md §F3; pattern from the reference's
tests/translator/cases.jsonl): one JSON case per line — query + expected rows
or expected error class — executed against the conftest points fixture."""

from __future__ import annotations

import json
import math
from pathlib import Path

import pytest

import sydradb_spark.errors as errors_mod

CASES = [
    json.loads(line)
    for line in (Path(__file__).parent / "golden" / "sydraql_cases.jsonl")
    .read_text()
    .splitlines()
    if line.strip()
]


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_golden(engine, case):
    expect = case["expect"]
    if "error" in expect:
        err_cls = getattr(errors_mod, expect["error"])
        with pytest.raises(err_cls):
            engine.query(case["query"]).df.collect()
        return
    got = [list(r) for r in engine.query(case["query"]).df.collect()]
    want = expect["rows"]
    assert len(got) == len(want), f"rows {got} != {want}"
    for g, w in zip(got, want):
        assert len(g) == len(w)
        for gv, wv in zip(g, w):
            if isinstance(wv, float) and gv is not None:
                assert math.isclose(gv, wv, rel_tol=1e-9, abs_tol=1e-9), (g, w)
            else:
                assert gv == wv, (g, w)
