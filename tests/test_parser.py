import pytest

from sydradb_spark.errors import ParseError
from sydradb_spark.sydraql import ast
from sydradb_spark.sydraql.parser import parse


def test_select_literal():
    stmt = parse("select 1")
    assert isinstance(stmt, ast.Select)
    assert stmt.selector is None
    assert isinstance(stmt.items[0].expr, ast.Literal)


def test_full_select_shape():
    # the SURVEY §7.1 milestone query — every reference plan node type
    stmt = parse(
        "select avg(value) from by_id(42) where time >= 0 and time < 3600 "
        "group by time_bucket(60, time) order by time_bucket_0 limit 10"
    )
    assert stmt.selector.kind == "by_id" and stmt.selector.series_id == 42
    assert isinstance(stmt.items[0].expr, ast.Call)
    assert stmt.items[0].expr.func == "avg"
    assert len(stmt.group_by) == 1
    assert stmt.group_by[0].func == "time_bucket"
    assert stmt.order_by[0].expr.name == "time_bucket_0"
    assert stmt.limit == 10


def test_name_selector():
    stmt = parse("select value from weather.room1 where time > 0")
    assert stmt.selector.kind == "name"
    assert stmt.selector.name == "weather.room1"


def test_precedence():
    # or < and < equality < comparison < additive < multiplicative < unary
    stmt = parse("select 1 + 2 * 3")
    e = stmt.items[0].expr
    assert e.op == ast.BinOp.ADD
    assert e.right.op == ast.BinOp.MUL

    stmt = parse("select 1 where true or false and true")
    e = stmt.where
    assert e.op == ast.BinOp.OR
    assert e.right.op == ast.BinOp.AND


def test_unary_not():
    # unary binds tighter than comparison in the reference grammar
    # (parser.zig:378-540): `not value > 3` is `(not value) > 3`
    stmt = parse("select 1 where not value > 3")
    assert stmt.where.op == ast.BinOp.GT
    assert stmt.where.left.op == ast.UnOp.NOT
    stmt = parse("select 1 where not (value > 3)")
    assert stmt.where.op == ast.UnOp.NOT


def test_regex_ops():
    stmt = parse("select 1 where tag.host =~ 'web-.*'")
    assert stmt.where.op == ast.BinOp.REGEX_MATCH
    assert stmt.where.left.name == "tag.host"


def test_between_sugar():
    stmt = parse("select value from a.b where time between 10 and 20")
    w = stmt.where
    assert w.op == ast.BinOp.AND
    assert w.left.op == ast.BinOp.GTE
    assert w.right.op == ast.BinOp.LTE


def test_fill_clauses():
    assert parse("select avg(value) from a.b where time > 0 group by time_bucket(60, time) fill(previous)").fill.kind == "previous"
    assert parse("select avg(value) from a.b where time > 0 group by time_bucket(60, time) fill(linear)").fill.kind == "linear"
    assert parse("select avg(value) from a.b where time > 0 group by time_bucket(60, time) fill(null)").fill.kind == "null"
    f = parse("select avg(value) from a.b where time > 0 group by time_bucket(60, time) fill(3.14)").fill
    assert f.kind == "constant" and f.constant.value == 3.14


def test_limit_offset():
    stmt = parse("select 1 limit 5 offset 2")
    assert stmt.limit == 5 and stmt.offset == 2


def test_order_by_desc():
    stmt = parse("select value from a.b where time > 0 order by value desc, time asc")
    assert stmt.order_by[0].descending is True
    assert stmt.order_by[1].descending is False


def test_insert_parse():
    stmt = parse("insert into weather.room1 (ts, value) values (100, 1.5), (200, 2.5)")
    assert isinstance(stmt, ast.Insert)
    assert stmt.target == "weather.room1"
    assert stmt.columns == ["ts", "value"]
    assert len(stmt.rows) == 2


def test_delete_parse():
    stmt = parse("delete from by_id(7) where time >= 0 and time < 100")
    assert isinstance(stmt, ast.Delete)
    assert stmt.target.series_id == 7


def test_explain_parse():
    stmt = parse("explain select 1")
    assert isinstance(stmt, ast.Explain)


def test_alias():
    stmt = parse("select tag.host as site from a.b where time > 0")
    assert stmt.items[0].alias == "site"


def test_parse_errors():
    for bad in ["", "select", "select 1 limit", "frobnicate 1", "select (1", "insert into t values"]:
        with pytest.raises(ParseError):
            parse(bad)


def test_duration_and_timestamp_literals_in_query():
    stmt = parse("select avg(value) from a.b where time >= 2024-01-15T00:00:00Z group by time_bucket(5m, time)")
    assert stmt.group_by[0].args[0].kind == "duration"
    assert stmt.group_by[0].args[0].value == 300
