"""SQL→sydraQL translator golden cases.

Behavioral contract from the reference corpus
(/root/reference/tests/translator/cases.jsonl, 18 cases) plus extras.
"""

from __future__ import annotations

import pytest

from sydradb_spark.compat.translator import CompatStats, translate

OK = [
    ("SELECT 1", "select 1"),
    ("SELECT 1;", "select 1"),
    ("select 1", "select 1"),
    ("INSERT INTO users(id) VALUES (1)", "insert into users (id) values (1)"),
    ("SELECT id, name FROM users", "select id,name from users"),
    ("SELECT name FROM users WHERE id = 42", "select name from users where id = 42"),
    ("select * from accounts", "select * from accounts"),
    ("DELETE FROM users WHERE id = 42", "delete from users where id = 42"),
    ("DELETE FROM sessions", "delete from sessions"),
    ("INSERT INTO t VALUES (1, 2)", "insert into t values (1, 2)"),
    ("  SELECT a FROM b ;  ", "select a from b"),
    ("SELECT 1 AS one", "select 1 AS one"),
    ("SELECT 2 * 3 + 1 AS x, 'hi' AS s", "select 2 * 3 + 1 AS x, 'hi' AS s"),
]

FALLBACK = [
    "UPDATE users SET name = 'rex' WHERE id = 1",
    "UPDATE accounts SET balance = balance + 1",
    "UPDATE users SET",
    "INSERT INTO users (id) VALUES (2) RETURNING id",
    "INSERT INTO users (id) VALUES (3) RETURNING",
    "UPDATE users SET name = 'rex' WHERE id = 1 RETURNING id",
    "UPDATE users SET name = 'rex' RETURNING",
    "DELETE FROM users WHERE",
    "DELETE FROM users WHERE id = 5 RETURNING id",
    "DELETE FROM users RETURNING",
    "CREATE TABLE t (x int)",
    "DROP TABLE t",
    "",
]


@pytest.mark.parametrize("sql,expected", OK)
def test_translates(sql, expected):
    out = translate(sql, CompatStats())
    assert out.ok, f"{sql!r} should translate"
    assert out.sydraql == expected


@pytest.mark.parametrize("sql", FALLBACK)
def test_fallbacks(sql):
    out = translate(sql, CompatStats())
    assert not out.ok
    assert out.sqlstate == "0A000"
    assert out.message == "feature not supported"


def test_stats_counters():
    stats = CompatStats()
    translate("SELECT 1", stats)
    translate("UPDATE x SET y = 1", stats)
    translate("SELECT a FROM t", stats)
    snap = stats.snapshot()
    assert snap["translations"] == 2 and snap["fallbacks"] == 1
    assert snap["cache_hits"] == 0
    assert len(stats.log) == 3 and stats.log[1]["fallback"] is True


def test_stats_per_class_counters():
    """Per-statement-class outcome counts (reference compat/stats.zig grown
    a dimension: each of the five translator shapes counts separately)."""
    stats = CompatStats()
    translate("SELECT 1", stats)
    translate("SELECT a FROM t", stats)
    translate("SELECT a FROM t WHERE RETURNING x", stats)
    translate("UPDATE x SET y = 1", stats)
    translate("INSERT INTO t VALUES (1)", stats)
    translate("VACUUM", stats)
    by_class = stats.snapshot()["by_class"]
    assert by_class["select_literal"] == {"translated": 1, "fallback": 0}
    assert by_class["select_from"] == {"translated": 1, "fallback": 1}
    assert by_class["update"] == {"translated": 0, "fallback": 1}
    assert by_class["insert"] == {"translated": 1, "fallback": 0}
    assert by_class["other"] == {"translated": 0, "fallback": 1}


def test_translation_cache_hits_on_global_path():
    from sydradb_spark.compat import translator as tr

    tr._CACHE.clear()
    before = tr.STATS.cache_hits
    sql = "SELECT cached_col FROM cache_test_table_xyz"
    first = translate(sql)
    second = translate(sql)
    assert first.sydraql == second.sydraql
    assert tr.STATS.cache_hits == before + 1


def test_metrics_render_labeled_compat_counters():
    from sydradb_spark import metrics

    translate("SELECT labeled_metric_probe FROM t")
    text = metrics.to_prometheus_text()
    assert "# TYPE sydra_compat_statements_total counter" in text
    assert 'sydra_compat_statements_total{class="select_from",outcome="translated"}' in text
    # HELP/TYPE emitted once per base name even with multiple labeled series
    assert text.count("# TYPE sydra_compat_statements_total counter") == 1
