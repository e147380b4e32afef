"""sydraQL AST.

Node shapes mirror reference src/sydra/query/ast.zig:4-168: Statement =
Select | Insert | Delete | Explain; expressions are literals, identifiers
(``time``, ``value``, ``tag.*``), unary (- not +), binary (arith, comparison,
regex, and/or), and calls.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class BinOp(Enum):
    OR = "or"
    AND = "and"
    EQ = "="
    NEQ = "!="
    REGEX_MATCH = "=~"
    REGEX_NOT_MATCH = "!~"
    LT = "<"
    LTE = "<="
    GT = ">"
    GTE = ">="
    ADD = "+"
    SUB = "-"
    MUL = "*"
    DIV = "/"
    MOD = "%"


class UnOp(Enum):
    NEG = "-"
    NOT = "not"
    POS = "+"


@dataclass
class Expr:
    pos: int = field(default=0, kw_only=True)


@dataclass
class Literal(Expr):
    # kind: int | float | string | bool | null | duration | timestamp
    kind: str
    value: object


@dataclass
class Identifier(Expr):
    """``time``, ``value``, or ``tag.<key>`` (case-insensitive).

    Reference type rules (type_inference.zig:92-110): time → timestamp,
    tag.* → nullable string, value → nullable value."""

    name: str  # lowercased; tag identifiers keep original key case after 'tag.'


@dataclass
class Unary(Expr):
    op: UnOp
    operand: Expr


@dataclass
class Binary(Expr):
    op: BinOp
    left: Expr
    right: Expr


@dataclass
class Call(Expr):
    func: str  # lowercased function name
    args: list[Expr]


@dataclass
class SelectItem:
    expr: Expr
    alias: str | None = None


@dataclass
class Selector:
    """FROM target. The reference physical scan only supports by_id(N)
    (operator.zig:263-272); name selectors error. We support both, plus
    name-with-tags (SURVEY §2.1 'easy win')."""

    kind: str  # "by_id" | "name"
    series_id: int | None = None
    name: str | None = None
    tags: dict[str, str] | None = None


@dataclass
class OrderItem:
    expr: Expr
    descending: bool = False


@dataclass
class Fill:
    """FILL(previous | linear | null | <constant-expr>) — reference
    ast.zig:129-139, parsed but never executed; we implement it."""

    kind: str  # "previous" | "linear" | "null" | "constant"
    constant: Expr | None = None


@dataclass
class Select:
    items: list[SelectItem]
    selector: Selector | None = None
    where: Expr | None = None
    group_by: list[Expr] = field(default_factory=list)
    fill: Fill | None = None
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None


@dataclass
class Insert:
    target: str
    columns: list[str]
    rows: list[list[Expr]]


@dataclass
class Delete:
    target: Selector
    where: Expr | None = None


@dataclass
class Explain:
    inner: object  # Select | Insert | Delete


Statement = Select | Insert | Delete | Explain
