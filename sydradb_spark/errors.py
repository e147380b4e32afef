"""Query diagnostics, mirroring the reference's error codes.

Reference: src/sydra/query/errors.zig (DiagnosticList) and the validator
rules in src/sydra/query/validator.zig:57-139.
"""

from __future__ import annotations


class SydraQLError(Exception):
    """Base for all query-pipeline errors. Carries a stable machine code."""

    code = "query_error"

    def __init__(self, message: str, *, pos: int | None = None):
        super().__init__(message)
        self.message = message
        self.pos = pos

    def to_dict(self) -> dict:
        d = {"code": self.code, "message": self.message}
        if self.pos is not None:
            d["pos"] = self.pos
        return d


class LexError(SydraQLError):
    code = "lex_error"


class ParseError(SydraQLError):
    code = "parse_error"


class ValidationError(SydraQLError):
    code = "validation_error"


class TimeRangeRequired(ValidationError):
    """SELECT-with-FROM and DELETE require a time predicate in WHERE
    (reference validator.zig:57-105)."""

    code = "time_range_required"


class UnknownFunction(ValidationError):
    """Unknown functions are rejected — closed registry
    (reference validator.zig:132-137)."""

    code = "unknown_function"


class TypeMismatch(ValidationError):
    code = "type_mismatch"


class ArityMismatch(ValidationError):
    code = "arity_mismatch"


class UnsupportedStatement(SydraQLError):
    """Statement parsed but not executable (reference plan.zig:99-104)."""

    code = "unsupported_statement"


class DivisionByZero(SydraQLError):
    """Reference raises DivisionByZero at runtime (expression.zig:119-122).

    We raise it at validation time only for literal zero divisors; runtime
    division by zero yields NULL (Spark semantics — documented delta)."""

    code = "division_by_zero"
