"""SydraQLEngine — the exec pipeline (reference src/sydra/query/exec.zig:14-61).

parse → validate → translate-to-DataFrame; Catalyst replaces the reference's
optimize/physical/Volcano stages. Per-stage µs timings are collected like the
reference's stats block (http.zig:270-295).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sydradb_spark.errors import TimeRangeRequired, UnsupportedStatement, ValidationError
from sydradb_spark.sydraql import ast
from sydradb_spark.sydraql.parser import parse
from sydradb_spark.sydraql.translator import Translator, _Ctx, _literal_value
from sydradb_spark.sydraql.validator import _has_time_predicate, validate


@dataclass
class QueryResult:
    df: DataFrame
    columns: list[str]
    stats: dict = field(default_factory=dict)


class SydraQLEngine:
    """Query engine over one points DataFrame (the canonical table,
    model.POINTS_SCHEMA). ``query()`` returns a lazy DataFrame — callers
    collect/stream it; nothing is materialized here."""

    def __init__(self, spark: SparkSession, points: DataFrame):
        self.spark = spark
        self.points = points

    def query(self, text: str) -> QueryResult:
        t0 = time.perf_counter()
        stmt = parse(text)
        t1 = time.perf_counter()
        validate(stmt)
        t2 = time.perf_counter()

        if isinstance(stmt, ast.Explain):
            inner = self._run(stmt.inner)
            plan = inner.df._jdf.queryExecution().explainString(
                self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            df = self.spark.createDataFrame([(line,) for line in plan.split("\n")], "plan: string")
            return QueryResult(df=df, columns=["plan"])

        result = self._run(stmt)
        t3 = time.perf_counter()
        result.stats = {
            "parse_us": int((t1 - t0) * 1e6),
            "validate_us": int((t2 - t1) * 1e6),
            "plan_us": int((t3 - t2) * 1e6),
        }
        return result

    def _run(self, stmt: ast.Statement) -> QueryResult:
        if isinstance(stmt, ast.Select):
            tr = Translator(self.points, self.spark).translate(stmt)
            return QueryResult(df=tr.df, columns=tr.columns)
        if isinstance(stmt, ast.Insert):
            return self._insert(stmt)
        if isinstance(stmt, ast.Delete):
            return self._delete(stmt)
        raise UnsupportedStatement(f"cannot execute {type(stmt).__name__}")

    # --- INSERT ------------------------------------------------------------
    # The reference parses INSERT but its plan builder rejects it
    # (plan.zig:99-104). We implement it: rows append to the in-memory points
    # frame (durable writes go through storage.writer).
    def _insert(self, stmt: ast.Insert) -> QueryResult:
        from sydradb_spark.model import with_identity

        cols = [c.lower() for c in (stmt.columns or ["ts", "value"])]
        if set(cols) - {"ts", "time", "value"}:
            raise ValidationError(f"INSERT columns must be ts/time/value, got {cols}")
        rows = []
        for tup in stmt.rows:
            vals = {}
            for c, e in zip(cols, tup):
                vals["ts" if c in ("ts", "time") else "value"] = _literal_value(e)
            rows.append((stmt.target, {}, int(vals["ts"]), float(vals["value"])))
        new = self.spark.createDataFrame(
            rows, "series string, tags map<string,string>, ts long, value double"
        )
        self.points = self.points.unionByName(with_identity(new))
        count = len(rows)
        df = self.spark.createDataFrame([(count,)], "inserted: long")
        return QueryResult(df=df, columns=["inserted"])

    # --- DELETE -------------------------------------------------------------
    # Reference: parsed, time predicate required, never executed
    # (parser.zig:201-217, validator.zig:96-105). Spark-first: anti-filter.
    def _delete(self, stmt: ast.Delete) -> QueryResult:
        if not _has_time_predicate(stmt.where):
            raise TimeRangeRequired("DELETE requires a time predicate in WHERE")
        tr = Translator(self.points, self.spark)
        scoped = tr._resolve_selector(stmt.target)
        ctx_pred = tr._row(stmt.where, _Ctx(), scoped)
        if stmt.target.kind == "by_id":
            sel_pred = F.col("series_id") == F.lit(stmt.target.series_id)
        else:
            sel_pred = F.col("series") == F.lit(stmt.target.name)
        # Null-safe negation: where the predicate evaluates to NULL (e.g.
        # tag.host = 'x' on rows missing that tag), ~NULL is NULL and a bare
        # filter would silently drop non-matching rows. Only rows where the
        # predicate is TRUE are deleted.
        self.points = self.points.filter(~F.coalesce(sel_pred & ctx_pred, F.lit(False)))
        df = self.spark.createDataFrame([(1,)], "deleted: long")
        return QueryResult(df=df, columns=["deleted"])
