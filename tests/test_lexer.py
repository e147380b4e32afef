import pytest

from sydradb_spark.errors import LexError
from sydradb_spark.sydraql.lexer import T, tokenize


def kinds(src):
    return [t.kind for t in tokenize(src)][:-1]  # drop EOF


def test_keywords_case_insensitive():
    assert kinds("SELECT select SeLeCt") == [T.SELECT] * 3


def test_operators():
    assert kinds("= != =~ !~ < <= > >= + - * / % ( ) , .") == [
        T.EQ, T.NEQ, T.REGEX_MATCH, T.REGEX_NOT_MATCH, T.LT, T.LTE, T.GT, T.GTE,
        T.PLUS, T.MINUS, T.STAR, T.SLASH, T.PERCENT, T.LPAREN, T.RPAREN, T.COMMA, T.DOT,
    ]


def test_numbers():
    toks = tokenize("42 3.14 1e3 2.5e-2")
    assert [t.kind for t in toks[:-1]] == [T.INT, T.FLOAT, T.FLOAT, T.FLOAT]
    assert toks[0].value == 42
    assert toks[1].value == 3.14
    assert toks[2].value == 1000.0
    assert toks[3].value == 0.025


def test_string_escape():
    # '' escape — reference parser.zig:653-669
    toks = tokenize("'it''s'")
    assert toks[0].kind == T.STRING
    assert toks[0].value == "it's"


def test_unterminated_string():
    with pytest.raises(LexError):
        tokenize("'oops")


def test_duration_literals():
    toks = tokenize("10s 5m 1h30m 7d 2w")
    assert [t.kind for t in toks[:-1]] == [T.DURATION] * 5
    assert [t.value for t in toks[:-1]] == [10, 300, 5400, 604800, 1209600]


def test_iso_timestamp_literal():
    toks = tokenize("2024-01-15T10:00:00Z")
    assert toks[0].kind == T.TIMESTAMP
    assert toks[0].value == 1705312800


def test_identifier_and_tag():
    toks = tokenize("tag.host value time by_id")
    assert [t.kind for t in toks[:-1]] == [T.IDENT, T.DOT, T.IDENT, T.IDENT, T.IDENT, T.IDENT]


def test_comment():
    assert kinds("select 1 -- trailing comment\n") == [T.SELECT, T.INT]
