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
    assert stats.snapshot() == {"translations": 2, "fallbacks": 1}
    assert len(stats.log) == 3 and stats.log[1]["fallback"] is True
