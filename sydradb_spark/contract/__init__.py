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


def all_oracles(only: set[str] | None = None) -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    if only is not None:
        # subset runs (scripts/verify_local.py NAME...) must not pay for —
        # or crash on — oracles they never compare: a generated oracle can
        # be super-linear in the twin (the minhash-group closure at sf10
        # spilled >70 GB of DuckDB temp and filled the disk, round 10)
        out = {k: v for k, v in out.items() if k in only}
    # an ORACLES value may be a zero-arg callable for SQL that must be
    # GENERATED at oracle_sql() time (e.g. ann_ivf inlines sample-trained
    # centroids as literals) — resolve lazily so generation cost/paths are
    # only touched when the oracle is actually requested
    return {k: (v() if callable(v) else v) for k, v in out.items()}


def _modules():
    # Catalog order IS check order: the driver caps the number of entries it
    # checks per round (r02 stopped at 50), so lifecycle + pipeline come
    # first and the core sydraQL surface last. POLICY (round 6): the catalog
    # total MUST stay ≤50 so every entry gets a CORRECTNESS row — when a new
    # operator needs an entry, consolidate near-duplicates into a labeled
    # union first (see the round-6 merges in core/lifecycle for the
    # pattern). tests/test_driver_contract.py enforces the cap.
    from sydradb_spark.contract import core

    mods = []
    for name in ("lifecycle", "pipeline"):
        try:
            mods.append(
                __import__(f"sydradb_spark.contract.{name}", fromlist=[name])
            )
        except ImportError:
            pass
    mods.append(core)
    return mods
