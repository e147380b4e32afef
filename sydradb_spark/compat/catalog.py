"""pg system-catalog emulation for the pgwire front-end.

The reference seeds a static catalog snapshot — ``pg_namespace`` /
``pg_class`` / ``pg_attribute`` / ``pg_type`` rows with deterministic OIDs —
so pg clients can introspect it (src/sydra/compat/catalog.zig: the snapshot
model and buildSnapshot's sorted-name OID assignment with bases 11000/22000;
src/sydra/catalog.zig:60-121: the default adapter — ``pg_catalog`` +
``public`` namespaces, the ``pg_type`` relation and its 11 columns, and a
28-entry type seed covering the scalar types and their array forms). The
reference surfaces the snapshot as JSON at ``/debug/compat/catalog``
(src/sydra/http.zig:491-623); here the same rows additionally answer the
introspection SQL psql sends over the wire (``\\dt``, ``\\d table``, driver
type-OID probes).

Serving strategy: the four catalog relations are materialized into an
in-memory DuckDB database and psql's machine-generated SQL is executed there
after a handful of mechanical pg-isms are rewritten (``pg_catalog.``
qualifiers, ``OPERATOR(pg_catalog.~)``, ``COLLATE``, ``::regclass`` casts,
Postgres' partial-match ``~`` vs DuckDB's full-match ``~``). This is
deliberately NOT routed through Spark: catalog lookups are tiny,
latency-bound metadata reads — a distributed scan would be the wrong plan at
any scale, exactly as the reference answers them from an in-process
snapshot rather than its storage engine.
"""

from __future__ import annotations

import re
import threading
from dataclasses import dataclass

NAMESPACE_OID_BASE = 11000  # compat/catalog.zig:6
RELATION_OID_BASE = 22000  # compat/catalog.zig:7


@dataclass(frozen=True)
class RelationSpec:
    namespace: str
    name: str
    kind: str = "r"  # r=table i=index v=view S=sequence
    persistence: str = "p"
    has_primary_key: bool = False
    row_estimate: float = 0.0
    is_partition: bool = False
    toast_relation_oid: int = 0
    owner: int = 10


@dataclass(frozen=True)
class TypeSpec:
    name: str
    oid: int
    length: int
    by_value: bool
    category: str = "U"
    element_type_oid: int = 0
    array_type_oid: int = 0
    namespace: str = "pg_catalog"


@dataclass(frozen=True)
class ColumnSpec:
    namespace: str
    relation: str
    name: str
    type_oid: int
    not_null: bool = False
    type_length: int = -1


# The reference's default type seed (src/sydra/catalog.zig:69-98): scalar
# types with their array OIDs, then the array types pointing back via typelem.
_SCALARS = [
    # (name, oid, len, byval, category, array_oid)
    ("bool", 16, 1, True, "B", 1000),
    ("int2", 21, 2, True, "N", 1005),
    ("int8", 20, 8, True, "N", 1016),
    ("int4", 23, 4, True, "N", 1007),
    ("float4", 700, 4, True, "N", 1021),
    ("float8", 701, 8, True, "N", 1022),
    ("numeric", 1700, -1, False, "N", 1231),
    ("text", 25, -1, False, "S", 1009),
    ("uuid", 2950, 16, True, "U", 2951),
    ("timestamp", 1114, 8, True, "D", 1115),
    ("timestamptz", 1184, 8, True, "D", 1185),
    ("date", 1082, 4, True, "D", 1182),
    ("time", 1083, 8, True, "D", 1183),
    ("jsonb", 3802, -1, False, "U", 3807),
]

DEFAULT_TYPES: tuple[TypeSpec, ...] = tuple(
    TypeSpec(name, oid, ln, byval, cat, array_type_oid=arr)
    for name, oid, ln, byval, cat, arr in _SCALARS
) + tuple(
    TypeSpec("_" + name, arr, -1, False, "A", element_type_oid=oid)
    for name, oid, _ln, _bv, _cat, arr in _SCALARS
)

DEFAULT_NAMESPACES: tuple[str, ...] = ("pg_catalog", "public")

# catalog.zig:65-67 — the one self-describing relation.
DEFAULT_RELATIONS: tuple[RelationSpec, ...] = (
    RelationSpec("pg_catalog", "pg_type", "r"),
)

# catalog.zig:100-112 — pg_type's column layout.
DEFAULT_COLUMNS: tuple[ColumnSpec, ...] = tuple(
    ColumnSpec("pg_catalog", "pg_type", name, oid, not_null=nn)
    for name, oid, nn in [
        ("oid", 23, True),
        ("typname", 25, True),
        ("typlen", 21, True),
        ("typbyval", 16, True),
        ("typtype", 25, False),
        ("typcategory", 25, False),
        ("typdelim", 25, False),
        ("typelem", 23, False),
        ("typarray", 23, False),
        ("typbasetype", 23, False),
        ("typcollation", 23, False),
    ]
)


def build_snapshot(
    namespaces: tuple[str, ...] = DEFAULT_NAMESPACES,
    relations: tuple[RelationSpec, ...] = DEFAULT_RELATIONS,
    types: tuple[TypeSpec, ...] = DEFAULT_TYPES,
    columns: tuple[ColumnSpec, ...] = DEFAULT_COLUMNS,
) -> dict[str, list[tuple]]:
    """Mirror buildSnapshot (compat/catalog.zig:176-385): namespaces sorted by
    name get OIDs from 11000, relations sorted by (namespace, name) from
    22000, attnums are 1-based per relation in sorted column order."""
    ns_names = sorted(set(namespaces) | {r.namespace for r in relations})
    ns_rows = [(NAMESPACE_OID_BASE + i, n, 10) for i, n in enumerate(ns_names)]
    ns_oid = {n: oid for oid, n, _ in ns_rows}

    rels = sorted(relations, key=lambda r: (r.namespace, r.name))
    class_rows = []
    rel_oid: dict[tuple[str, str], int] = {}
    for i, r in enumerate(rels):
        oid = RELATION_OID_BASE + i
        rel_oid[(r.namespace, r.name)] = oid
        class_rows.append(
            (
                oid,
                r.name,
                ns_oid[r.namespace],
                r.kind,
                r.persistence,
                r.row_estimate,
                r.has_primary_key,
                r.is_partition,
                r.toast_relation_oid,
                r.owner,  # relowner: psql's \dt reads it; NamespaceRow's owner
            )
        )

    for t in types:
        if t.namespace not in ns_oid:
            # reference buildSnapshot returns error.MissingNamespace
            # (compat/catalog.zig) — fail loudly, never mis-assign the OID
            # of whatever namespace happens to sort first.
            raise KeyError(
                f"type {t.name!r} references unknown namespace "
                f"{t.namespace!r} (reference: error.MissingNamespace)"
            )
    type_rows = [
        (
            t.oid,
            t.name,
            ns_oid[t.namespace],
            t.length,
            t.by_value,
            "b",
            t.category,
            ",",
            t.element_type_oid,
            t.array_type_oid,
            0,
            0,
        )
        for t in sorted(types, key=lambda t: (t.namespace, t.name))
    ]

    # Position-less columns sort by name within their relation, exactly as
    # the reference's lessThan does (compat/catalog.zig:331-347), so attnums
    # match the reference snapshot byte for byte.
    attr_rows = []
    attnum: dict[int, int] = {}
    for c in sorted(columns, key=lambda c: (c.namespace, c.relation, c.name)):
        roid = rel_oid[(c.namespace, c.relation)]
        attnum[roid] = attnum.get(roid, 0) + 1
        attr_rows.append(
            (
                roid,
                c.name,
                c.type_oid,
                attnum[roid],
                c.not_null,
                False,
                False,
                c.type_length,
                -1,
                " ",
                " ",
                0,
            )
        )

    return {
        "pg_namespace": ns_rows,
        "pg_class": class_rows,
        "pg_type": type_rows,
        "pg_attribute": attr_rows,
    }


# The four seeded relations. pg_class/pg_attribute carry DEFAULT-valued
# psql-compat columns beyond the reference's snapshot fields (describe.c for
# server_version 14 reads relchecks/relhasindex/…/attcollation in its table
# and column queries); the snapshot tuples stay reference-shaped and are
# inserted by explicit column list (_SNAPSHOT_COLS).
_DDL = {
    "pg_namespace": "(oid INT, nspname TEXT, nspowner INT)",
    "pg_class": (
        "(oid INT, relname TEXT, relnamespace INT, relkind TEXT,"
        " relpersistence TEXT, reltuples DOUBLE, relhaspkey BOOLEAN,"
        " relispartition BOOLEAN, reltoastrelid INT, relowner INT,"
        " relchecks SMALLINT DEFAULT 0, relhasindex BOOLEAN DEFAULT false,"
        " relhasrules BOOLEAN DEFAULT false,"
        " relhastriggers BOOLEAN DEFAULT false,"
        " relrowsecurity BOOLEAN DEFAULT false,"
        " relforcerowsecurity BOOLEAN DEFAULT false,"
        " reloftype INT DEFAULT 0, reltablespace INT DEFAULT 0,"
        " relreplident TEXT DEFAULT 'd', relam INT DEFAULT 2,"
        " relacl TEXT DEFAULT NULL, reloptions TEXT DEFAULT NULL)"
    ),
    "pg_type": (
        "(oid INT, typname TEXT, typnamespace INT, typlen SMALLINT,"
        " typbyval BOOLEAN, typtype TEXT, typcategory TEXT, typdelim TEXT,"
        " typelem INT, typarray INT, typbasetype INT, typcollation INT)"
    ),
    "pg_attribute": (
        "(attrelid INT, attname TEXT, atttypid INT, attnum SMALLINT,"
        " attnotnull BOOLEAN, atthasdef BOOLEAN, attisdropped BOOLEAN,"
        " attlen SMALLINT, atttypmod INT, attidentity TEXT,"
        " attgenerated TEXT, attndims INT, attcollation INT DEFAULT 0)"
    ),
}

_SNAPSHOT_COLS = {
    "pg_namespace": "oid, nspname, nspowner",
    "pg_class": (
        "oid, relname, relnamespace, relkind, relpersistence, reltuples,"
        " relhaspkey, relispartition, reltoastrelid, relowner"
    ),
    "pg_type": (
        "oid, typname, typnamespace, typlen, typbyval, typtype, typcategory,"
        " typdelim, typelem, typarray, typbasetype, typcollation"
    ),
    "pg_attribute": (
        "attrelid, attname, atttypid, attnum, attnotnull, atthasdef,"
        " attisdropped, attlen, atttypmod, attidentity, attgenerated, attndims"
    ),
}

# Empty relations psql's describe queries join against (footer/unconditional
# queries in describe.c: default expressions, indexes, constraints,
# inheritance, triggers, access methods, collations, row-level policies,
# extended statistics, publications). Empty is correct — the engine has none
# of these objects — but the tables must EXIST for DuckDB to bind the SQL.
_SHIM_DDL = {
    "pg_attrdef": "(adrelid INT, adnum SMALLINT, adbin TEXT)",
    "pg_index": (
        "(indexrelid INT, indrelid INT, indisprimary BOOLEAN,"
        " indisunique BOOLEAN, indisclustered BOOLEAN, indisvalid BOOLEAN,"
        " indisreplident BOOLEAN, indnullsnotdistinct BOOLEAN, indkey TEXT,"
        " indpred TEXT, indexprs TEXT)"
    ),
    "pg_constraint": (
        "(oid INT, conname TEXT, conrelid INT, contype TEXT, conindid INT,"
        " confrelid INT, conparentid INT, condeferrable BOOLEAN,"
        " condeferred BOOLEAN, convalidated BOOLEAN, conbin TEXT)"
    ),
    "pg_inherits": (
        "(inhrelid INT, inhparent INT, inhseqno INT,"
        " inhdetachpending BOOLEAN)"
    ),
    "pg_trigger": (
        "(oid INT, tgrelid INT, tgname TEXT, tgenabled TEXT,"
        " tgisinternal BOOLEAN, tgconstraint INT, tgparentid INT)"
    ),
    "pg_am": "(oid INT, amname TEXT, amtype TEXT)",
    "pg_collation": "(oid INT, collname TEXT, collnamespace INT)",
    "pg_policy": (
        "(oid INT, polname TEXT, polrelid INT, polcmd TEXT,"
        " polpermissive BOOLEAN, polroles INT[], polqual TEXT,"
        " polwithcheck TEXT)"
    ),
    "pg_roles": "(oid INT, rolname TEXT)",
    "pg_statistic_ext": (
        "(oid INT, stxrelid INT, stxname TEXT, stxnamespace INT,"
        " stxkeys TEXT, stxkind TEXT[], stxstattarget INT)"
    ),
    "pg_publication": (
        "(oid INT, pubname TEXT, puballtables BOOLEAN, pubinsert BOOLEAN,"
        " pubupdate BOOLEAN, pubdelete BOOLEAN, pubtruncate BOOLEAN,"
        " pubviaroot BOOLEAN)"
    ),
    "pg_publication_rel": "(oid INT, prpubid INT, prrelid INT)",
    "pg_depend": (
        "(classid INT, objid INT, objsubid INT, refclassid INT,"
        " refobjid INT, refobjsubid INT, deptype TEXT)"
    ),
    "pg_description": (
        "(objoid INT, classoid INT, objsubid INT, description TEXT)"
    ),
    "pg_rewrite": "(oid INT, ev_class INT, rulename TEXT, ev_enabled TEXT)",
}

# 'heap' is the only access method psql's \d LEFT JOINs for (relam default 2).
_SHIM_ROWS = {"pg_am": [(2, "heap", "t")]}

# NULL-returning / constant shims for the pg_catalog functions psql's
# introspection queries call; enough for \dt, \d and \d <table>.
# DuckDB 1.0 macros cannot be overloaded by arity, so the 3-arg
# pg_get_expr(adbin, adrelid, pretty) is REWRITTEN to the 2-arg form
# (rewrite_catalog_sql) instead of defined twice.
_MACROS = [
    "CREATE MACRO pg_table_is_visible(x) AS true",
    "CREATE MACRO pg_get_userbyid(x) AS 'sydra'",
    "CREATE MACRO format_type(t, m) AS"
    " coalesce((SELECT typname FROM pg_type WHERE oid = t), '???')",
    "CREATE MACRO pg_get_expr(a, b) AS CAST(NULL AS TEXT)",
    "CREATE MACRO obj_description(a, b) AS CAST(NULL AS TEXT)",
    "CREATE MACRO col_description(a, b) AS CAST(NULL AS TEXT)",
    "CREATE MACRO shobj_description(a, b) AS CAST(NULL AS TEXT)",
    "CREATE MACRO pg_total_relation_size(x) AS CAST(0 AS BIGINT)",
    "CREATE MACRO pg_get_indexdef(a, b, c) AS CAST(NULL AS TEXT)",
    "CREATE MACRO pg_get_constraintdef(a, b) AS CAST(NULL AS TEXT)",
    "CREATE MACRO pg_get_partkeydef(x) AS CAST(NULL AS TEXT)",
    "CREATE MACRO pg_get_statisticsobjdef_columns(x) AS CAST(NULL AS TEXT)",
    "CREATE MACRO pg_relation_is_publishable(x) AS false",
]

_CATALOG_REF = re.compile(
    r"\bpg_catalog\s*\.|\bpg_(?:class|namespace|attribute|type)\b", re.IGNORECASE
)

_OP_TILDE = re.compile(r"OPERATOR\s*\(\s*pg_catalog\s*\.\s*(!?~)\s*\)", re.IGNORECASE)
_COLLATE = re.compile(r'\bCOLLATE\s+(?:pg_catalog\s*\.\s*)?(?:"?default"?|"C")', re.IGNORECASE)
_QUALIFIER = re.compile(r"\bpg_catalog\s*\.", re.IGNORECASE)
# ::regclass on a quoted RELATION NAME (ORM/driver reflection:
# `WHERE attrelid = 'pg_catalog.pg_type'::regclass`) resolves through
# pg_class like Postgres does; handled BEFORE the qualifier strip so the
# schema inside the literal survives. Remaining regcasts (numeric-oid
# regclass, regtype, regnamespace) just drop — the bare value compares fine.
_REGCLASS_LIT = re.compile(
    r"'((?:[A-Za-z_][\w$]*\.)?[A-Za-z_][\w$]*)'\s*::\s*"
    r"(?:pg_catalog\s*\.\s*)?regclass",
    re.IGNORECASE,
)
_REGCAST = re.compile(r"::\s*reg\w+")
# DuckDB 1.0 macros can't overload by arity: drop the pretty-print flag from
# psql's 3-arg pg_get_expr(d.adbin, d.adrelid, true).
_PG_GET_EXPR3 = re.compile(
    r"\bpg_get_expr\s*\(([^(),]+,[^(),]+),[^(),]+\)", re.IGNORECASE
)
# Postgres `~` is a partial match; DuckDB's `~` is a full match. Rewrite to
# regexp_matches, which has Postgres semantics. psql only uses the operator
# between a bare identifier/column and a string literal.
_NEG_MATCH = re.compile(r"([\w.\"]+)\s*!~\s*('(?:[^']|'')*')")
_POS_MATCH = re.compile(r"([\w.\"]+)\s*~\s*('(?:[^']|'')*')")


def is_catalog_query(sql: str) -> bool:
    return bool(_CATALOG_REF.search(sql))


_LEADING_NOISE = re.compile(r"^(?:\s+|--[^\n]*\n|/\*.*?\*/)*", re.DOTALL)


def _assert_select_only(sql: str) -> None:
    """Reject anything but one SELECT/WITH statement. Semicolons in string
    literals can false-positive the multi-statement check; psql's generated
    introspection never contains them, and rejection fails closed."""
    body = _LEADING_NOISE.sub("", sql)
    first = body.split(None, 1)[0].upper() if body.split(None, 1) else ""
    if first not in ("SELECT", "WITH"):
        raise ValueError(
            f"catalog store is read-only: expected SELECT, got {first or 'empty'!r}"
        )
    if body.rstrip().rstrip(";").count(";"):
        raise ValueError("catalog store accepts a single statement only")


def _regclass_subquery(m: re.Match) -> str:
    name = m.group(1)
    if "." in name:
        schema, rel = name.split(".", 1)
        return (
            "(SELECT c.oid FROM pg_class c JOIN pg_namespace n"
            " ON c.relnamespace = n.oid"
            f" WHERE n.nspname = '{schema}' AND c.relname = '{rel}')"
        )
    # unqualified: Postgres resolves via search_path; with only
    # pg_catalog/public seeded, min(oid) is the deterministic first match.
    return f"(SELECT min(c.oid) FROM pg_class c WHERE c.relname = '{name}')"


def rewrite_catalog_sql(sql: str) -> str:
    s = _OP_TILDE.sub(lambda m: f" {m.group(1)} ", sql)
    s = _REGCLASS_LIT.sub(_regclass_subquery, s)
    s = _COLLATE.sub("", s)
    s = _QUALIFIER.sub("", s)
    s = _PG_GET_EXPR3.sub(lambda m: f"pg_get_expr({m.group(1)})", s)
    s = _REGCAST.sub("", s)
    s = _NEG_MATCH.sub(lambda m: f"NOT regexp_matches({m.group(1)}, {m.group(2)})", s)
    s = _POS_MATCH.sub(lambda m: f"regexp_matches({m.group(1)}, {m.group(2)})", s)
    return s


_INT_TYPES = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}


def _spark_ish_type(duck_type: str) -> str:
    """Map a DuckDB RESULT type name (relation .types, e.g. INTEGER/VARCHAR/
    BOOLEAN — not the DBAPI description codes, which collapse to
    NUMBER/STRING) to the simpleString names wire._oid_for knows."""
    t = duck_type.upper()
    if t in _INT_TYPES:
        return "bigint"
    if t in ("FLOAT", "REAL", "DOUBLE") or t.startswith("DECIMAL"):
        return "double"
    if t == "BOOLEAN":
        return "boolean"
    return "string"


def snapshot_json(snapshot: dict[str, list[tuple]]) -> dict:
    """The reference's ``/debug/compat/catalog`` JSON shape
    (src/sydra/http.zig:491-623: namespaces/classes/attributes/types arrays
    with the field names below; typinput/typoutput default 0,
    compat/catalog.zig:58-59). Serving it over HTTP is one handler away —
    like metrics, the engine side exposes the payload, the app the route."""
    return {
        "namespaces": [
            {"oid": oid, "name": name}
            for oid, name, _owner in snapshot["pg_namespace"]
        ],
        "classes": [
            {
                "oid": r[0],
                "name": r[1],
                "namespace": r[2],
                "kind": r[3],
                "persistence": r[4],
                "tuples": r[5],
                "has_pkey": r[6],
                "is_partition": r[7],
                "toast_oid": r[8],
            }
            for r in snapshot["pg_class"]
        ],
        "attributes": [
            {
                "rel_oid": a[0],
                "name": a[1],
                "type_oid": a[2],
                "attnum": a[3],
                "not_null": a[4],
                "has_default": a[5],
                "is_dropped": a[6],
                "len": a[7],
                "typmod": a[8],
                "identity": a[9],
                "generated": a[10],
                "dims": a[11],
            }
            for a in snapshot["pg_attribute"]
        ],
        "types": [
            {
                "oid": t[0],
                "name": t[1],
                "namespace": t[2],
                "len": t[3],
                "byval": t[4],
                "type": t[5],
                "category": t[6],
                "delim": t[7],
                "elem": t[8],
                "array": t[9],
                "basetype": t[10],
                "collation": t[11],
                "input": 0,
                "output": 0,
            }
            for t in snapshot["pg_type"]
        ],
    }


class CatalogStore:
    """The seeded snapshot plus its DuckDB serving connection.

    One store per PgWireServer; queries are serialized by a lock (DuckDB
    connections are not thread-safe, and catalog lookups are sub-millisecond).
    """

    def __init__(
        self,
        relations: tuple[RelationSpec, ...] = DEFAULT_RELATIONS,
        columns: tuple[ColumnSpec, ...] = DEFAULT_COLUMNS,
    ):
        self.snapshot = build_snapshot(relations=relations, columns=columns)
        self._lock = threading.Lock()
        self._con = None

    def _connect(self):
        import duckdb

        con = duckdb.connect(":memory:")
        # pg_type must exist before the format_type macro referencing it.
        for table in ("pg_type", "pg_namespace", "pg_class", "pg_attribute"):
            con.execute(f"CREATE TABLE {table} {_DDL[table]}")
            rows = self.snapshot[table]
            if rows:
                ph = ",".join("?" * len(rows[0]))
                con.executemany(
                    f"INSERT INTO {table} ({_SNAPSHOT_COLS[table]})"
                    f" VALUES ({ph})",
                    rows,
                )
        for table, ddl in _SHIM_DDL.items():
            con.execute(f"CREATE TABLE {table} {ddl}")
            for row in _SHIM_ROWS.get(table, ()):
                ph = ",".join("?" * len(row))
                con.execute(f"INSERT INTO {table} VALUES ({ph})", row)
        for macro in _MACROS:
            con.execute(macro)
        # Hardening: is_catalog_query routes any pg_*-mentioning statement
        # here, and this connection is shared by every (unauthenticated)
        # wire session — so the embedded engine must not be a general SQL
        # engine. The reference serves introspection from a static snapshot
        # executor (compat/catalog.zig), not a query engine; the DuckDB
        # equivalent is: no filesystem/network reach (read_text/COPY/
        # httpfs), and the setting frozen so no statement can turn it back.
        con.execute("SET enable_external_access = false")
        con.execute("SET lock_configuration = true")
        return con

    def execute(self, sql: str) -> tuple[list[tuple[str, str]], list[tuple]]:
        """Run one introspection statement; returns (fields, rows) where
        fields are (name, spark-ish type) pairs as the wire encoder expects.

        Read-only by construction: psql/driver introspection is always a
        single SELECT (or WITH...SELECT), so anything else — DDL, DML, COPY,
        multi-statement batches — is rejected before DuckDB sees it. Fails
        closed: a false rejection surfaces as a pg error on an exotic
        client, never as writable access to the shared catalog."""
        _assert_select_only(sql)
        with self._lock:
            if self._con is None:
                self._con = self._connect()
            # .sql() relation carries REAL DuckDB type names; the DBAPI
            # cursor.description collapses them to NUMBER/STRING, which made
            # every column (including oid/typarray INTs drivers probe) report
            # as text OID 25.
            rel = self._con.sql(rewrite_catalog_sql(sql.rstrip().rstrip(";")))
            if rel is None:
                return [], []
            cols = [
                (name, _spark_ish_type(str(t)))
                for name, t in zip(rel.columns, rel.types)
            ]
            return cols, rel.fetchall()
