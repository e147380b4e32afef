"""SQL → sydraQL string-level translator (the pgwire compat layer's core).

Reference: src/sydra/query/translator.zig:77-264 — a deliberately narrow
rewriter for the five statement shapes a Postgres client commonly sends:

- ``SELECT 1``                          → ``select 1``
- ``SELECT cols FROM t [WHERE cond]``   → ``select c1,c2 from t [where cond]``
- ``INSERT INTO t [(cols)] VALUES (…)`` → ``insert into t [(cols)] values (…)``
- ``DELETE FROM t [WHERE cond]``        → ``delete from t [where cond]``
- ``UPDATE …`` / any ``RETURNING``      → SQLSTATE 0A000 feature_not_supported

Everything else falls back with SQLSTATE 0A000. Translation/fallback counters
mirror compat/stats.zig; behavior is pinned by the reference's golden corpus
(tests/translator/cases.jsonl, mirrored in tests/test_compat_translator.py).
The wire protocol itself is out of scope (SURVEY §7.3) — Spark deployments
get SQL-over-the-wire from Spark Connect / Thrift instead.
"""

from __future__ import annotations

import re
import threading
import time
from dataclasses import dataclass, field

SQLSTATE_FEATURE_NOT_SUPPORTED = "0A000"
_MSG = "feature not supported"


@dataclass
class Translation:
    ok: bool
    sydraql: str | None = None
    sqlstate: str | None = None
    message: str | None = None


@dataclass
class CompatStats:
    """compat/stats.zig equivalent (translations/fallbacks/cache_hits) plus
    per-statement-class outcome counts and a bounded structured log."""

    translations: int = 0
    fallbacks: int = 0
    cache_hits: int = 0
    by_class: dict = field(default_factory=dict)
    log: list[dict] = field(default_factory=list)
    max_log: int = 256

    def record(
        self, sql: str, out: Translation, duration_us: int, cls: str = "other"
    ) -> None:
        outcome = "translated" if out.ok else "fallback"
        if out.ok:
            self.translations += 1
        else:
            self.fallbacks += 1
        per = self.by_class.setdefault(cls, {"translated": 0, "fallback": 0})
        per[outcome] += 1
        self.log.append(
            {
                "sql": sql,
                "sydraql": out.sydraql or "",
                "fallback": not out.ok,
                "class": cls,
                "duration_us": duration_us,
            }
        )
        if len(self.log) > self.max_log:
            self.log.pop(0)

    def snapshot(self) -> dict:
        return {
            "translations": self.translations,
            "fallbacks": self.fallbacks,
            "cache_hits": self.cache_hits,
            "by_class": {k: dict(v) for k, v in self.by_class.items()},
        }


STATS = CompatStats()

# Translation cache (reference keeps one per session and counts hits via
# stats.noteCacheHit): pgwire clients resend identical machine-generated
# statements, so a small exact-string cache removes the regex pass.
_CACHE: dict[str, "tuple[Translation, str]"] = {}
_CACHE_MAX = 256


def _fallback() -> Translation:
    return Translation(ok=False, sqlstate=SQLSTATE_FEATURE_NOT_SUPPORTED, message=_MSG)


_RETURNING = re.compile(r"(^|\s)returning(\s|$)", re.IGNORECASE)


def _translate(sql: str) -> tuple[Translation, str]:
    """Returns (translation, statement class) — the class feeds the
    per-class outcome counters (CompatStats.by_class, metrics)."""
    s = sql.strip().rstrip(" \t\r\n;").strip()

    if s.lower() == "select 1":
        return Translation(ok=True, sydraql="select 1"), "select_literal"

    m = re.match(r"explain\s+(.+)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        # EXPLAIN <inner>: translate the inner statement, re-prefix — psql
        # users get the engine's formatted Spark plan (beyond the reference
        # translator, which has no EXPLAIN shape; the sydraQL engine does)
        inner, cls = _translate(m.group(1))
        if inner.ok:
            return Translation(ok=True, sydraql=f"explain {inner.sydraql}"), "explain"
        return inner, "explain"

    m = re.match(r"select\s+(.+?)\s+from\s+(.+)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        cols_raw, rest = m.group(1).strip(), m.group(2).strip()
        if cols_raw and rest and not _RETURNING.search(rest):
            table, where = rest, None
            wm = re.search(r"\swhere\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
            if wm:
                cond = wm.group(1).strip()
                before = rest[: wm.start()].strip()
                if cond and before:
                    table, where = before, cond
            if not re.search(r"\swhere\s*$", table, re.IGNORECASE):
                cols = ",".join(c.strip() for c in cols_raw.split(",") if c.strip())
                if cols and table:
                    out = f"select {cols} from {table}"
                    if where:
                        out += f" where {where}"
                    return Translation(ok=True, sydraql=out), "select_from"
        return _fallback(), "select_from"

    m = re.match(r"select\s+(.+)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        # FROM-less expression select (OneRow): pass the select list through —
        # sydraQL handles literals, aliases and arithmetic. Beyond the
        # reference's literal `SELECT 1` case, which stays pinned above.
        exprs = m.group(1).strip()
        if exprs and not _RETURNING.search(exprs):
            return Translation(ok=True, sydraql=f"select {exprs}"), "select_expr"
        return _fallback(), "select_expr"

    m = re.match(
        r"insert\s+into\s+([^\s(]+)\s*(?:\(([^)]*)\))?\s*values\s*\((.*)\)\s*(.*)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        table, cols, values, tail = (
            m.group(1),
            (m.group(2) or "").strip(),
            m.group(3).strip(),
            m.group(4).strip(),
        )
        if tail:  # RETURNING or anything else after VALUES(...) → fallback
            return _fallback(), "insert"
        out = f"insert into {table}"
        if cols:
            out += f" ({cols})"
        out += f" values ({values})"
        return Translation(ok=True, sydraql=out), "insert"
    if re.match(r"insert\s", s, re.IGNORECASE):
        return _fallback(), "insert"

    if re.match(r"update\s", s, re.IGNORECASE):
        return _fallback(), "update"

    m = re.match(r"delete\s+from\s+(.+)$", s, re.IGNORECASE | re.DOTALL)
    if m:
        rest = m.group(1).strip()
        if not rest or _RETURNING.search(rest):
            return _fallback(), "delete"
        table, where = rest, None
        wm = re.search(r"\swhere(\s+(.*))?$", rest, re.IGNORECASE | re.DOTALL)
        if wm:
            cond = (wm.group(2) or "").strip()
            before = rest[: wm.start()].strip()
            if not cond or not before:  # bare trailing WHERE → fallback
                return _fallback(), "delete"
            table, where = before, cond
        out = f"delete from {table}"
        if where:
            out += f" where {where}"
        return Translation(ok=True, sydraql=out), "delete"

    return _fallback(), "other"


# Guards _CACHE and the global STATS against concurrent pgwire session
# threads: an unguarded two-thread eviction can raise KeyError out of
# translate() (dropping the client connection), and bare `+=` on counters
# loses increments.
_LOCK = threading.Lock()


def translate(sql: str, stats: CompatStats | None = None) -> Translation:
    from sydradb_spark import metrics

    st = stats or STATS
    # cache only on the global-stats (wire server) path: callers passing an
    # explicit CompatStats expect every call recorded.
    use_cache = stats is None
    if use_cache:
        with _LOCK:
            cached = _CACHE.get(sql)
            if cached is not None:
                st.cache_hits += 1
        if cached is not None:
            metrics.inc("sydra_compat_cache_hits_total")
            return cached[0]
    t0 = time.perf_counter()
    out, cls = _translate(sql)
    duration_us = int((time.perf_counter() - t0) * 1e6)
    if use_cache:
        with _LOCK:
            st.record(sql, out, duration_us, cls)
            if len(_CACHE) >= _CACHE_MAX:
                _CACHE.pop(next(iter(_CACHE)))
            _CACHE[sql] = (out, cls)
    else:
        st.record(sql, out, duration_us, cls)
    outcome = "translated" if out.ok else "fallback"
    metrics.inc(f'sydra_compat_statements_total{{class="{cls}",outcome="{outcome}"}}')
    metrics.inc(
        "sydra_compat_translations_total" if out.ok else "sydra_compat_fallbacks_total"
    )
    return out
