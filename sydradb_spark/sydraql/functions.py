"""The closed function registry.

Mirrors reference src/sydra/query/functions.zig:208-406 — a fixed builtin
table with type signatures; the validator rejects anything else
(validator.zig:132-137). Type tags follow functions.zig:10-35, with the
coercion lattice of functions.zig:51-60 (numeric/value/duration accept
{value,numeric,float,integer}; timestamp accepts value).

The reference runtime only executed avg/sum/count/abs/time_bucket; the rest
were declared ("registry-only"). Here every declared function is executable
— Spark makes them cheap (SURVEY §2 legend).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class Ty(Enum):
    ANY = "any"
    NULL = "null"
    BOOLEAN = "boolean"
    INTEGER = "integer"
    FLOAT = "float"
    NUMERIC = "numeric"
    VALUE = "value"
    STRING = "string"
    TIMESTAMP = "timestamp"
    DURATION = "duration"
    TAGS = "tags"


# coercion lattice (functions.zig:51-60)
_ACCEPTS: dict[Ty, set[Ty]] = {
    Ty.ANY: set(Ty),
    Ty.NUMERIC: {Ty.NUMERIC, Ty.VALUE, Ty.FLOAT, Ty.INTEGER, Ty.DURATION, Ty.TIMESTAMP},
    Ty.VALUE: {Ty.VALUE, Ty.NUMERIC, Ty.FLOAT, Ty.INTEGER},
    Ty.DURATION: {Ty.DURATION, Ty.VALUE, Ty.NUMERIC, Ty.FLOAT, Ty.INTEGER},
    Ty.TIMESTAMP: {Ty.TIMESTAMP, Ty.VALUE, Ty.NUMERIC, Ty.INTEGER, Ty.FLOAT},
    Ty.FLOAT: {Ty.FLOAT, Ty.INTEGER, Ty.NUMERIC, Ty.VALUE},
    Ty.INTEGER: {Ty.INTEGER},
    Ty.STRING: {Ty.STRING},
    Ty.BOOLEAN: {Ty.BOOLEAN},
    Ty.NULL: {Ty.NULL},
    Ty.TAGS: {Ty.TAGS},
}


def accepts(param: Ty, arg: Ty) -> bool:
    return arg in _ACCEPTS.get(param, {param})


class Kind(Enum):
    SCALAR = "scalar"
    AGGREGATE = "aggregate"
    WINDOW = "window"
    FILL = "fill"


@dataclass(frozen=True)
class Param:
    ty: Ty
    nullable: bool = True
    optional: bool = False


@dataclass(frozen=True)
class Signature:
    name: str
    kind: Kind
    params: tuple[Param, ...]
    returns: Ty
    returns_nullable: bool = True
    variadic: bool = False
    # planner hints (functions.zig:77-82)
    requires_sorted_input: bool = False
    bucket_sensitive: bool = False
    needs_window_frame: bool = False
    min_args: int = field(default=-1)

    def arity_ok(self, n: int) -> bool:
        required = sum(1 for p in self.params if not p.optional)
        if self.variadic:
            return n >= required
        return required <= n <= len(self.params)


def _num(optional: bool = False, nullable: bool = True) -> Param:
    return Param(Ty.NUMERIC, nullable=nullable, optional=optional)


REGISTRY: dict[str, Signature] = {
    s.name: s
    for s in [
        # --- aggregates (functions.zig:209-262, 345-372) -------------------
        Signature("avg", Kind.AGGREGATE, (_num(),), Ty.FLOAT),
        Signature("sum", Kind.AGGREGATE, (_num(),), Ty.VALUE),
        Signature("count", Kind.AGGREGATE, (Param(Ty.ANY, optional=True),), Ty.INTEGER, returns_nullable=False),
        Signature("min", Kind.AGGREGATE, (_num(),), Ty.VALUE),
        Signature("max", Kind.AGGREGATE, (_num(),), Ty.VALUE),
        Signature("first", Kind.AGGREGATE, (_num(),), Ty.VALUE, requires_sorted_input=True),
        Signature("last", Kind.AGGREGATE, (_num(),), Ty.VALUE, requires_sorted_input=True),
        Signature(
            "percentile",
            Kind.AGGREGATE,
            (_num(), Param(Ty.FLOAT, nullable=False)),
            Ty.FLOAT,
            requires_sorted_input=True,
        ),
        # beyond-reference scale path: Greenwald-Khanna sketch percentile
        # (bounded state per group; exact `percentile` sorts the group).
        # Exact for groups under the sketch accuracy (1e4 rows) — identical
        # answers at test scale, bounded memory at 100 TB scale.
        Signature(
            "approx_percentile",
            Kind.AGGREGATE,
            (_num(), Param(Ty.FLOAT, nullable=False)),
            Ty.FLOAT,
        ),
        Signature("rate", Kind.AGGREGATE, (_num(),), Ty.FLOAT, requires_sorted_input=True, bucket_sensitive=True),
        # beyond-reference: counter-reset-aware increase (Prometheus
        # semantics; plain `delta` goes negative across a counter restart)
        Signature("increase", Kind.AGGREGATE, (_num(),), Ty.FLOAT, requires_sorted_input=True, bucket_sensitive=True),
        Signature("irate", Kind.AGGREGATE, (_num(),), Ty.FLOAT, requires_sorted_input=True, bucket_sensitive=True),
        Signature("delta", Kind.AGGREGATE, (_num(),), Ty.FLOAT, requires_sorted_input=True, bucket_sensitive=True),
        Signature("integral", Kind.AGGREGATE, (_num(),), Ty.FLOAT, requires_sorted_input=True, bucket_sensitive=True),
        # --- window functions (functions.zig:326-344, 373-393) -------------
        Signature(
            "lag",
            Kind.WINDOW,
            (Param(Ty.ANY), Param(Ty.INTEGER, nullable=False, optional=True)),
            Ty.ANY,
            requires_sorted_input=True,
            needs_window_frame=True,
        ),
        Signature(
            "lead",
            Kind.WINDOW,
            (Param(Ty.ANY), Param(Ty.INTEGER, nullable=False, optional=True)),
            Ty.ANY,
            requires_sorted_input=True,
            needs_window_frame=True,
        ),
        Signature(
            "moving_avg",
            Kind.WINDOW,
            (_num(), Param(Ty.DURATION, nullable=False)),
            Ty.FLOAT,
            requires_sorted_input=True,
            needs_window_frame=True,
        ),
        Signature(
            "ema",
            Kind.WINDOW,
            (_num(), Param(Ty.DURATION, nullable=False), Param(Ty.FLOAT, nullable=False)),
            Ty.FLOAT,
            requires_sorted_input=True,
            needs_window_frame=True,
        ),
        # --- scalars (functions.zig:264-324) --------------------------------
        Signature("abs", Kind.SCALAR, (Param(Ty.NUMERIC, nullable=False),), Ty.FLOAT, returns_nullable=False),
        Signature("ceil", Kind.SCALAR, (Param(Ty.NUMERIC, nullable=False),), Ty.FLOAT, returns_nullable=False),
        Signature("floor", Kind.SCALAR, (Param(Ty.NUMERIC, nullable=False),), Ty.FLOAT, returns_nullable=False),
        Signature("round", Kind.SCALAR, (Param(Ty.NUMERIC, nullable=False),), Ty.FLOAT, returns_nullable=False),
        Signature(
            "pow",
            Kind.SCALAR,
            (Param(Ty.NUMERIC, nullable=False), Param(Ty.NUMERIC, nullable=False)),
            Ty.FLOAT,
            returns_nullable=False,
        ),
        Signature("ln", Kind.SCALAR, (Param(Ty.NUMERIC, nullable=False),), Ty.FLOAT),
        Signature("sqrt", Kind.SCALAR, (Param(Ty.NUMERIC, nullable=False),), Ty.FLOAT),
        Signature("now", Kind.SCALAR, (), Ty.TIMESTAMP, returns_nullable=False),
        Signature(
            "time_bucket",
            Kind.SCALAR,
            (
                Param(Ty.DURATION, nullable=False),
                Param(Ty.TIMESTAMP, nullable=False),
                Param(Ty.TIMESTAMP, nullable=False, optional=True),
            ),
            Ty.TIMESTAMP,
            returns_nullable=False,
            bucket_sensitive=True,
        ),
        # --- fill-kind (functions.zig:394-405) ------------------------------
        Signature("coalesce", Kind.FILL, (Param(Ty.ANY),), Ty.ANY, variadic=True),
        Signature("fill_forward", Kind.FILL, (_num(),), Ty.VALUE, requires_sorted_input=True),
    ]
}


AGGREGATES = {n for n, s in REGISTRY.items() if s.kind == Kind.AGGREGATE}
WINDOW_FUNCS = {n for n, s in REGISTRY.items() if s.kind == Kind.WINDOW}
