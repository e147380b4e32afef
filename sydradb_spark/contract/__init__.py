"""Driver-contract catalog: merges per-area QUERIES/ORACLES dicts.

``__spark_entry__.queries()/oracle_sql()`` re-export these. Submodules:
- core: the sydraQL query surface (SURVEY §2)
- pipeline: LLM-data-pipeline operators (dedup, similarity, text, multimodal)
- lifecycle: storage, compaction, retention, tag find, ingest
"""

from __future__ import annotations


def all_queries() -> dict:
    out: dict = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    from sydradb_spark.contract import core

    mods = [core]
    for name in ("pipeline", "lifecycle"):
        try:
            mods.append(
                __import__(f"sydradb_spark.contract.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    return mods
