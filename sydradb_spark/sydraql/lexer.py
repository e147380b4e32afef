"""sydraQL lexer.

Token surface mirrors reference src/sydra/query/lexer.zig:6-74 (keywords,
operators ``= != =~ !~ < <= > >= + - * / %``, int/float literals, single-quoted
strings with ``''`` escape) plus two extensions the reference's design doc
specs but never lexed (docs/docs/concepts/sydraql-design.md:92):

- duration literals: ``10s 5m 1h30m 7d`` → DURATION token (seconds, int)
- ISO8601 timestamp literals: ``2024-01-15T10:00:00Z`` → TIMESTAMP token
  (epoch seconds, int)

Keywords and identifiers are case-insensitive (reference lexer lowercases).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum, auto

from sydradb_spark.errors import LexError


class T(Enum):
    SELECT = auto()
    INSERT = auto()
    INTO = auto()
    VALUES = auto()
    DELETE = auto()
    EXPLAIN = auto()
    FROM = auto()
    WHERE = auto()
    GROUP = auto()
    BY = auto()
    ORDER = auto()
    LIMIT = auto()
    OFFSET = auto()
    FILL = auto()
    AS = auto()
    AND = auto()
    OR = auto()
    NOT = auto()
    ASC = auto()
    DESC = auto()
    TRUE = auto()
    FALSE = auto()
    NULL = auto()
    BETWEEN = auto()

    IDENT = auto()
    INT = auto()
    FLOAT = auto()
    STRING = auto()
    DURATION = auto()
    TIMESTAMP = auto()

    EQ = auto()  # =
    NEQ = auto()  # !=
    REGEX_MATCH = auto()  # =~
    REGEX_NOT_MATCH = auto()  # !~
    LT = auto()
    LTE = auto()
    GT = auto()
    GTE = auto()
    PLUS = auto()
    MINUS = auto()
    STAR = auto()
    SLASH = auto()
    PERCENT = auto()
    LPAREN = auto()
    RPAREN = auto()
    LBRACE = auto()
    RBRACE = auto()
    COMMA = auto()
    DOT = auto()
    EOF = auto()


KEYWORDS = {
    "select": T.SELECT,
    "insert": T.INSERT,
    "into": T.INTO,
    "values": T.VALUES,
    "delete": T.DELETE,
    "explain": T.EXPLAIN,
    "from": T.FROM,
    "where": T.WHERE,
    "group": T.GROUP,
    "by": T.BY,
    "order": T.ORDER,
    "limit": T.LIMIT,
    "offset": T.OFFSET,
    "fill": T.FILL,
    "as": T.AS,
    "and": T.AND,
    "or": T.OR,
    "not": T.NOT,
    "asc": T.ASC,
    "desc": T.DESC,
    "true": T.TRUE,
    "false": T.FALSE,
    "null": T.NULL,
    "between": T.BETWEEN,
}

_DURATION_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}

_ISO_TS = re.compile(
    r"(\d{4})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?(?:[Zz])?"
)
_DURATION = re.compile(r"(?:(\d+)w)?(?:(\d+)d)?(?:(\d+)h)?(?:(\d+)m)?(?:(\d+)s)?")


@dataclass
class Token:
    kind: T
    text: str
    pos: int
    value: object = None  # parsed literal value where applicable

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Token({self.kind.name}, {self.text!r})"


def _parse_iso_epoch(m: re.Match) -> int:
    import calendar

    y, mo, d, h, mi, s = (int(m.group(i)) for i in range(1, 7))
    return calendar.timegm((y, mo, d, h, mi, s, 0, 0, 0))


def tokenize(src: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
            continue
        if c == "-" and i + 1 < n and src[i + 1] == "-":  # -- line comment
            j = src.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        start = i
        # ISO timestamp literal (starts with 4 digits + '-').
        # ASCII-only digit test: str.isdigit() accepts unicode digits like
        # '\u00b2' that int() rejects (found by the fuzz property test).
        if c in "0123456789":
            m = _ISO_TS.match(src, i)
            if m:
                tokens.append(Token(T.TIMESTAMP, m.group(0), start, _parse_iso_epoch(m)))
                i = m.end()
                continue
            # number: int / float / duration
            j = i
            while j < n and src[j] in "0123456789":
                j += 1
            if j < n and (src[j] in ".eE") and not (src[j] in "eE" and j + 1 < n and src[j + 1].isalpha() and src[j + 1] not in "+-0123456789"):
                # float literal (reference parser.zig:763-765 detects . e E)
                k = j
                if src[k] == ".":
                    k += 1
                    while k < n and src[k] in "0123456789":
                        k += 1
                if k < n and src[k] in "eE":
                    k += 1
                    if k < n and src[k] in "+-":
                        k += 1
                    while k < n and src[k] in "0123456789":
                        k += 1
                text = src[i:k]
                try:
                    tokens.append(Token(T.FLOAT, text, start, float(text)))
                except ValueError:
                    raise LexError(f"bad float literal {text!r}", pos=start)
                i = k
                continue
            if j < n and src[j] in "smhdw":
                # possible duration literal: 1h30m, 10s, ...
                dm = _DURATION.match(src, i)
                if dm and dm.end() > i and (dm.end() >= n or not src[dm.end()].isalnum()):
                    secs = sum(
                        int(g) * mult
                        for g, mult in zip(dm.groups(), (604800, 86400, 3600, 60, 1))
                        if g
                    )
                    tokens.append(Token(T.DURATION, src[i : dm.end()], start, secs))
                    i = dm.end()
                    continue
            tokens.append(Token(T.INT, src[i:j], start, int(src[i:j])))
            i = j
            continue
        if c == "'":
            # single-quoted string, '' escape (reference parser.zig:653-669)
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise LexError("unterminated string literal", pos=start)
                if src[j] == "'":
                    if j + 1 < n and src[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    j += 1
                    break
                buf.append(src[j])
                j += 1
            tokens.append(Token(T.STRING, src[start:j], start, "".join(buf)))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            kind = KEYWORDS.get(word.lower())
            if kind is not None:
                tokens.append(Token(kind, word, start))
            else:
                tokens.append(Token(T.IDENT, word, start, word))
            i = j
            continue
        two = src[i : i + 2]
        if two == "!=":
            tokens.append(Token(T.NEQ, two, start))
            i += 2
            continue
        if two == "=~":
            tokens.append(Token(T.REGEX_MATCH, two, start))
            i += 2
            continue
        if two == "!~":
            tokens.append(Token(T.REGEX_NOT_MATCH, two, start))
            i += 2
            continue
        if two == "<=":
            tokens.append(Token(T.LTE, two, start))
            i += 2
            continue
        if two == ">=":
            tokens.append(Token(T.GTE, two, start))
            i += 2
            continue
        single = {
            "=": T.EQ,
            "<": T.LT,
            ">": T.GT,
            "+": T.PLUS,
            "-": T.MINUS,
            "*": T.STAR,
            "/": T.SLASH,
            "%": T.PERCENT,
            "(": T.LPAREN,
            ")": T.RPAREN,
            "{": T.LBRACE,
            "}": T.RBRACE,
            ",": T.COMMA,
            ".": T.DOT,
        }.get(c)
        if single is None:
            raise LexError(f"unexpected character {c!r}", pos=start)
        tokens.append(Token(single, c, start))
        i += 1
    tokens.append(Token(T.EOF, "", n))
    return tokens
