"""pg catalog emulation: psql 14's actual introspection SQL end-to-end.

The query strings below are the machine-generated SQL psql 14 sends for
``\\dt`` and ``\\d pg_type`` (describe.c, server_version 14 — the version the
wire server reports), plus ORM/driver reflection shapes. They run through
``rewrite_catalog_sql`` into the DuckDB-backed CatalogStore, and at the end
over a real pgwire socket so routing in wire.py is covered too.
"""

from __future__ import annotations

import struct

import pytest

from sydradb_spark.compat.catalog import (
    CatalogStore,
    TypeSpec,
    build_snapshot,
    is_catalog_query,
    rewrite_catalog_sql,
)

# psql resolves names to OIDs before the detail queries; with the seeded
# snapshot pg_type deterministically gets RELATION_OID_BASE = 22000.
REL = "22000"

PSQL_DT = """SELECT n.nspname as "Schema",
  c.relname as "Name",
  CASE c.relkind WHEN 'r' THEN 'table' WHEN 'v' THEN 'view' WHEN 'm' THEN 'materialized view' WHEN 'i' THEN 'index' WHEN 'S' THEN 'sequence' WHEN 's' THEN 'special' WHEN 't' THEN 'TOAST table' WHEN 'f' THEN 'foreign table' WHEN 'p' THEN 'partitioned table' WHEN 'I' THEN 'partitioned index' END as "Type",
  pg_catalog.pg_get_userbyid(c.relowner) as "Owner"
FROM pg_catalog.pg_class c
     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
WHERE c.relkind IN ('r','p','')
      AND n.nspname <> 'pg_catalog'
      AND n.nspname !~ '^pg_toast'
      AND n.nspname <> 'information_schema'
  AND pg_catalog.pg_table_is_visible(c.oid)
ORDER BY 1,2;"""

PSQL_RESOLVE = """SELECT c.oid,
  n.nspname,
  c.relname
FROM pg_catalog.pg_class c
     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
WHERE c.relname OPERATOR(pg_catalog.~) '^(pg_type)$' COLLATE pg_catalog.default
  AND pg_catalog.pg_table_is_visible(c.oid)
ORDER BY 2, 3;"""

PSQL_TABLE_INFO = f"""SELECT c.relchecks, c.relkind, c.relhasindex, c.relhasrules, c.relhastriggers, c.relrowsecurity, c.relforcerowsecurity, false AS relhasoids, c.relispartition, '', c.reltablespace, CASE WHEN c.reloftype = 0 THEN '' ELSE c.reloftype::pg_catalog.regtype::pg_catalog.text END, c.relpersistence, c.relreplident, am.amname
FROM pg_catalog.pg_class c
 LEFT JOIN pg_catalog.pg_am am ON (c.relam = am.oid)
WHERE c.oid = '{REL}';"""

PSQL_COLUMNS = f"""SELECT a.attname,
  pg_catalog.format_type(a.atttypid, a.atttypmod),
  (SELECT pg_catalog.pg_get_expr(d.adbin, d.adrelid, true)
   FROM pg_catalog.pg_attrdef d
   WHERE d.adrelid = a.attrelid AND d.adnum = a.attnum AND a.atthasdef),
  a.attnotnull,
  (SELECT c.collname FROM pg_catalog.pg_collation c, pg_catalog.pg_type t
   WHERE c.oid = a.attcollation AND t.oid = a.atttypid AND a.attcollation <> t.typcollation) AS attcollation,
  a.attidentity,
  a.attgenerated
FROM pg_catalog.pg_attribute a
WHERE a.attrelid = '{REL}' AND a.attnum > 0 AND NOT a.attisdropped
ORDER BY a.attnum;"""

PSQL_INDEXES = f"""SELECT c2.relname, i.indisprimary, i.indisunique, i.indisclustered, i.indisvalid, pg_catalog.pg_get_indexdef(i.indexrelid, 0, true),
  pg_catalog.pg_get_constraintdef(con.oid, true), contype, condeferrable, condeferred, i.indisreplident, c2.reltablespace
FROM pg_catalog.pg_class c, pg_catalog.pg_class c2, pg_catalog.pg_index i
  LEFT JOIN pg_catalog.pg_constraint con ON (conrelid = i.indrelid AND conindid = i.indexrelid AND contype IN ('p','u','x'))
WHERE c.oid = '{REL}' AND c.oid = i.indrelid AND i.indexrelid = c2.oid
ORDER BY i.indisprimary DESC, c2.relname;"""

PSQL_POLICIES = f"""SELECT pol.polname, pol.polpermissive,
CASE WHEN pol.polroles = '{{0}}' THEN NULL ELSE pg_catalog.array_to_string(array(select rolname from pg_catalog.pg_roles where oid = any (pol.polroles) order by 1),',') END,
pg_catalog.pg_get_expr(pol.polqual, pol.polrelid),
pg_catalog.pg_get_expr(pol.polwithcheck, pol.polrelid),
CASE pol.polcmd
WHEN 'r' THEN 'SELECT'
WHEN 'a' THEN 'INSERT'
WHEN 'w' THEN 'UPDATE'
WHEN 'd' THEN 'DELETE'
END AS cmd
FROM pg_catalog.pg_policy pol
WHERE pol.polrelid = '{REL}' ORDER BY 1;"""

PSQL_EXT_STATS = f"""SELECT oid, stxrelid::pg_catalog.regclass, stxnamespace::pg_catalog.regnamespace::pg_catalog.text AS nsp, stxname,
pg_catalog.pg_get_statisticsobjdef_columns(oid) AS columns,
  'd' = any(stxkind) AS ndist_enabled,
  'f' = any(stxkind) AS deps_enabled,
  'm' = any(stxkind) AS mcv_enabled,
stxstattarget
FROM pg_catalog.pg_statistic_ext stat
WHERE stxrelid = '{REL}'
ORDER BY nsp, stxname;"""

PSQL_PUBLICATIONS = f"""SELECT pubname
FROM pg_catalog.pg_publication p
JOIN pg_catalog.pg_publication_rel pr ON p.oid = pr.prpubid
WHERE pr.prrelid = '{REL}'
UNION ALL
SELECT pubname
FROM pg_catalog.pg_publication p
WHERE p.puballtables AND pg_catalog.pg_relation_is_publishable('{REL}')
ORDER BY 1;"""


@pytest.fixture(scope="module")
def store():
    return CatalogStore()


def test_psql_dt_lists_no_user_tables(store):
    # \dt filters out pg_catalog; the only seeded relation lives there —
    # empty result with the right header, exactly like real pg.
    fields, rows = store.execute(PSQL_DT)
    assert [f[0] for f in fields] == ["Schema", "Name", "Type", "Owner"]
    assert rows == []


def test_psql_name_resolution(store):
    fields, rows = store.execute(PSQL_RESOLVE)
    assert rows == [(22000, "pg_catalog", "pg_type")]
    assert fields[0] == ("oid", "bigint")  # INT column, not text


def test_psql_table_info(store):
    _, rows = store.execute(PSQL_TABLE_INFO)
    assert len(rows) == 1
    r = rows[0]
    assert r[0] == 0 and r[1] == "r"  # relchecks, relkind
    assert r[14] == "heap"  # am.amname via relam join


def test_psql_column_query(store):
    """The \\d column list: 11 pg_type columns in attnum order, typed via
    format_type, 3-arg pg_get_expr rewritten to the 2-arg macro."""
    fields, rows = store.execute(PSQL_COLUMNS)
    assert len(rows) == 11
    names = [r[0] for r in rows]
    assert names[0] == "oid" and "typname" in names and "typarray" in names
    by_name = {r[0]: r for r in rows}
    assert by_name["typname"][1] == "text"  # format_type resolved
    assert by_name["oid"][3] is True  # attnotnull
    assert all(r[2] is None for r in rows)  # no defaults


def test_psql_footer_queries_bind(store):
    for sql in (PSQL_INDEXES, PSQL_POLICIES, PSQL_EXT_STATS, PSQL_PUBLICATIONS):
        fields, rows = store.execute(sql)
        assert rows == []
        assert fields


def test_regclass_literal_resolves_through_pg_class(store):
    _, rows = store.execute(
        "SELECT attname FROM pg_catalog.pg_attribute "
        "WHERE attrelid = 'pg_catalog.pg_type'::regclass AND attnum > 0 "
        "ORDER BY attnum"
    )
    assert len(rows) == 11
    _, rows2 = store.execute(
        "SELECT attname FROM pg_catalog.pg_attribute "
        "WHERE attrelid = 'pg_type'::regclass ORDER BY attnum"
    )
    assert len(rows2) == 11


def test_driver_type_probe_returns_int_fields(store):
    fields, rows = store.execute(
        "SELECT t.oid, t.typarray FROM pg_catalog.pg_type t "
        "JOIN pg_catalog.pg_namespace ns ON t.typnamespace = ns.oid "
        "WHERE t.typname = 'int8'"
    )
    assert fields == [("oid", "bigint"), ("typarray", "bigint")]
    assert rows == [(20, 1016)]


def test_rewrite_rules():
    assert (
        rewrite_catalog_sql("x OPERATOR(pg_catalog.~) '^(a)$'")
        == "regexp_matches(x, '^(a)$')"
    )
    assert "pg_get_expr(d.adbin, d.adrelid)" in rewrite_catalog_sql(
        "pg_get_expr(d.adbin, d.adrelid, true)"
    )
    out = rewrite_catalog_sql("attrelid = 'pg_catalog.pg_type'::regclass")
    assert "nspname = 'pg_catalog'" in out and "relname = 'pg_type'" in out
    # numeric-oid regclass (psql's pre-resolved form) still just drops
    assert rewrite_catalog_sql("c.oid = '22000'::regclass") == "c.oid = '22000'"


def test_is_catalog_query():
    assert is_catalog_query("SELECT * FROM pg_catalog.pg_class")
    assert is_catalog_query("select oid from pg_type where typname = 'x'")
    assert not is_catalog_query("SELECT value FROM cpu.total WHERE time > 0")


def test_snapshot_json_shape():
    """Reference /debug/compat/catalog payload (http.zig:491-623): four
    arrays, reference field names, 28-type seed, deterministic OIDs."""
    import json

    from sydradb_spark.compat.catalog import snapshot_json

    j = snapshot_json(build_snapshot())
    json.dumps(j)  # serializable
    assert [ns["name"] for ns in j["namespaces"]] == ["pg_catalog", "public"]
    assert j["namespaces"][0]["oid"] == 11000
    assert len(j["classes"]) == 1
    cls = j["classes"][0]
    assert cls == {
        "oid": 22000,
        "name": "pg_type",
        "namespace": 11000,
        "kind": "r",
        "persistence": "p",
        "tuples": 0.0,
        "has_pkey": False,
        "is_partition": False,
        "toast_oid": 0,
    }
    assert len(j["types"]) == 28
    boolt = next(t for t in j["types"] if t["name"] == "bool")
    assert boolt["oid"] == 16 and boolt["array"] == 1000
    assert boolt["input"] == 0 and boolt["output"] == 0
    assert len(j["attributes"]) == 11
    assert {a["name"] for a in j["attributes"]} >= {"oid", "typname", "typarray"}


def test_unknown_type_namespace_raises():
    with pytest.raises(KeyError, match="MissingNamespace"):
        build_snapshot(types=(TypeSpec("custom", 90000, -1, False, namespace="nope"),))


# --- over the wire ------------------------------------------------------------


def _read_msg(sock):
    import struct as _s

    tag = sock.recv(1)
    (length,) = _s.unpack("!I", sock.recv(4))
    payload = b""
    while len(payload) < length - 4:
        payload += sock.recv(length - 4 - len(payload))
    return tag, payload


def _query_with_oids(sock, sql):
    """Simple query returning (cols, type_oids, rows, err)."""
    payload = sql.encode() + b"\x00"
    sock.sendall(b"Q" + struct.pack("!I", len(payload) + 4) + payload)
    cols, oids, rows, err = None, None, [], None
    while True:
        tag, payload = _read_msg(sock)
        if tag == b"T":
            (n,) = struct.unpack("!H", payload[:2])
            cols, oids, off = [], [], 2
            for _ in range(n):
                end = payload.index(b"\x00", off)
                cols.append(payload[off:end].decode())
                desc = payload[end + 1 : end + 19]
                oids.append(struct.unpack("!I", desc[6:10])[0])
                off = end + 19
        elif tag == b"D":
            (n,) = struct.unpack("!H", payload[:2])
            off, vals = 2, []
            for _ in range(n):
                (ln,) = struct.unpack("!i", payload[off : off + 4])
                off += 4
                if ln == -1:
                    vals.append(None)
                else:
                    vals.append(payload[off : off + ln].decode())
                    off += ln
            rows.append(vals)
        elif tag == b"E":
            err = payload
        elif tag == b"Z":
            return cols, oids, rows, err


def test_wire_routes_catalog_queries(spark, points):
    from test_pgwire import _connect

    from sydradb_spark.compat.wire import PgWireServer
    from sydradb_spark.sydraql.engine import SydraQLEngine

    server = PgWireServer(SydraQLEngine(spark, points)).start()
    try:
        sock = _connect(server.addr)
        cols, oids, rows, err = _query_with_oids(
            sock,
            "SELECT c.oid, c.relname FROM pg_catalog.pg_class c "
            "WHERE c.relname = 'pg_type'",
        )
        assert err is None
        assert cols == ["oid", "relname"]
        assert oids == [20, 25]  # int8, text — not all-text
        assert rows == [["22000", "pg_type"]]
        # the full \dt SQL goes through the catalog path, not Spark
        cols2, _, _, err2 = _query_with_oids(sock, PSQL_DT)
        assert err2 is None and cols2 == ["Schema", "Name", "Type", "Owner"]
        # and a normal engine query still works on the same connection
        _, _, rows3, err3 = _query_with_oids(sock, "SELECT 1 AS one")
        assert err3 is None and rows3 == [["1"]]
        sock.close()
    finally:
        server.stop()


def test_catalog_store_is_read_only(store):
    """ADVICE r05 (high): any pg_*-mentioning statement reaches the shared
    DuckDB connection from unauthenticated wire sessions — the store must
    reject writes/DDL/multi-statement batches and have no filesystem reach."""
    fields, rows = store.execute("SELECT count(*) AS n FROM pg_class")
    assert rows[0][0] >= 1
    for bad in (
        "DROP TABLE pg_class",
        "DELETE FROM pg_class",
        "INSERT INTO pg_class (oid) VALUES (1)",
        "UPDATE pg_class SET relname = 'x'",
        "COPY pg_class TO '/tmp/pwned.csv'",
        "CREATE TABLE evil AS SELECT * FROM pg_class",
        "SET enable_external_access = true",
        "SELECT 1 FROM pg_class; DROP TABLE pg_class",
        "/* sneaky */ ATTACH '/tmp/evil.db'",
    ):
        with pytest.raises(ValueError):
            store.execute(bad)
    # SELECT-shaped but needing filesystem access: blocked by DuckDB's
    # enable_external_access=false (and lock_configuration pins it)
    with pytest.raises(Exception, match="(?i)external|permission|disabled"):
        store.execute(
            "SELECT * FROM read_text('/etc/passwd') r JOIN pg_class c ON true"
        )
    # the catalog still answers after all the rejected attempts
    _, rows2 = store.execute("SELECT count(*) AS n FROM pg_class")
    assert rows2 == rows


def test_translator_cache_thread_safety():
    """ADVICE r05 (low): concurrent translate() calls share _CACHE/STATS;
    eviction races must not raise out of translate()."""
    import threading

    from sydradb_spark.compat.translator import translate

    errors = []

    def hammer(tid: int) -> None:
        try:
            for i in range(400):
                t = translate(f"SELECT c{tid}_{i} FROM t WHERE a = {i}")
                assert t.ok
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=hammer, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
