"""Minimal PostgreSQL v3 wire-protocol front-end (simple query only).

The reference serves pg clients over a socket (src/sydra/compat/wire/
server.zig:249-429, session.zig:75-140): startup handshake → AuthenticationOk
→ simple 'Q' queries answered with RowDescription / DataRow / CommandComplete.
This is the same scope over the compat SQL→sydraQL translator and the Spark
engine — extended-protocol messages (Parse/Bind/Execute), auth, and TLS are
out of scope exactly as they are in the reference's simple-query path (TLS
requests are answered 'N' = not supported, like server.zig's SSLRequest
handling).

Production posture: this front-end is a thin driver-side shim for pg-client
compatibility (psql, BI tools poking at results). Heavy concurrent SQL
traffic belongs on Spark Connect / Thrift; DEPLOY.md states the split.

Text-format encoding only (format code 0), which every client supports.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Any

# pg type OIDs for the engine's output types (pg_type.dat, public catalog)
_OID_INT8 = 20
_OID_FLOAT8 = 701
_OID_TEXT = 25
_OID_BOOL = 16

_SSL_REQUEST = 80877103
_CANCEL_REQUEST = 80877102
_MAX_MESSAGE = 16 * 1024 * 1024  # server.zig:15 max_message_size


def _oid_for(spark_type: str) -> int:
    if spark_type in ("bigint", "int", "smallint", "tinyint", "long"):
        return _OID_INT8
    if spark_type in ("double", "float", "decimal"):
        return _OID_FLOAT8
    if spark_type == "boolean":
        return _OID_BOOL
    return _OID_TEXT


def _encode(value: Any) -> bytes | None:
    if value is None:
        return None
    if isinstance(value, bool):
        return b"t" if value else b"f"
    if isinstance(value, float):
        return repr(value).encode()
    return str(value).encode()


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _error_response(message: str, sqlstate: str = "42601") -> bytes:
    fields = (
        b"S" + b"ERROR\x00"
        + b"C" + sqlstate.encode() + b"\x00"
        + b"M" + message.encode() + b"\x00"
        + b"\x00"
    )
    return _msg(b"E", fields)


def _notice_response(message: str) -> bytes:
    """NoticeResponse carrying one diagnostic line, exactly the reference's
    field layout (compat/wire/protocol.zig:203-218: S=NOTICE, M=message)."""
    return _msg(b"N", b"S" + b"NOTICE\x00" + b"M" + message.encode() + b"\x00" + b"\x00")


def _diagnostic_notices(
    fields: list[tuple[str, str]],
    result_stats: dict,
    operators: list[dict],
    rows_emitted: int,
    stream_ms: int,
    trace_id: str,
) -> list[bytes]:
    """The reference's post-row diagnostics (compat/wire/server.zig:281-312):
    schema, trace_id, one line per operator, then the metrics summary —
    psql shows them after the rows, so a user debugging through psql gets
    the same per-operator visibility the HTTP stats block carries. Operator
    stats come from the executed Spark plan (api._plan_stats) instead of
    Volcano cursor counters; rows_scanned sums the scan leaves' output like
    the reference sums its `scan` operators (server.zig:283-287)."""
    out = []
    if fields:
        cols = ", ".join(
            '{name:"%s",type:"%s",nullable:true}' % (n, t) for n, t in fields
        )
        out.append(_notice_response(f"schema=[{cols}]"))
    if trace_id:
        out.append(_notice_response(f"trace_id={trace_id}"))
    rows_scanned = 0
    for op in operators:
        name = str(op.get("name", ""))
        rows_out = op.get("rows_out") or 0
        if "scan" in name.lower():
            rows_scanned += int(rows_out)
        elapsed_ms = int(op.get("elapsed_ms") or 0)
        out.append(
            _notice_response(
                f"operator={name} rows_out={rows_out} elapsed_ms={elapsed_ms}"
            )
        )
    plan_us = sum(
        int(result_stats.get(k, 0)) for k in ("parse_us", "validate_us", "plan_us")
    )
    out.append(
        _notice_response(
            f"metrics rows={rows_emitted} scanned={rows_scanned} "
            f"stream_ms={stream_ms} plan_ms={plan_us // 1000}"
        )
    )
    return out


def _row_description(fields: list[tuple[str, str]]) -> bytes:
    out = struct.pack("!H", len(fields))
    for name, spark_type in fields:
        out += (
            name.encode()
            + b"\x00"
            + struct.pack("!IHIhih", 0, 0, _oid_for(spark_type), -1, -1, 0)
        )
    return _msg(b"T", out)


def _data_row(values: list[Any]) -> bytes:
    out = struct.pack("!H", len(values))
    for v in values:
        enc = _encode(v)
        if enc is None:
            out += struct.pack("!i", -1)
        else:
            out += struct.pack("!I", len(enc)) + enc
    return _msg(b"D", out)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("client closed")
        buf += chunk
    return buf


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:  # noqa: C901 — one message loop, kept together
        server: PgWireServer = self.server.pgwire  # type: ignore[attr-defined]
        sock = self.request
        try:
            self._startup(sock)
            self._ready(sock)
            while True:
                tag = _recv_exact(sock, 1)
                (length,) = struct.unpack("!I", _recv_exact(sock, 4))
                if length < 4 or length - 4 > _MAX_MESSAGE:
                    return  # reference: InvalidMessageLength/MessageTooLarge
                payload = _recv_exact(sock, length - 4)
                if tag == b"X":  # Terminate
                    return
                if tag == b"P":  # Parse — targeted response, server.zig:184-247
                    self._parse_message(sock, payload)
                    self._ready(sock)
                    continue
                if tag == b"S":  # Sync — bare ReadyForQuery (server.zig:112)
                    self._ready(sock)
                    continue
                if tag != b"Q":
                    sock.sendall(
                        _error_response(
                            f"unsupported message type {tag!r} "
                            "(simple query protocol only)",
                            "0A000",
                        )
                    )
                    self._ready(sock)
                    continue
                sql = payload.rstrip(b"\x00").decode("utf-8", "replace")
                self._query(sock, server, sql)
                self._ready(sock)
        except (ConnectionError, OSError):
            return

    def _startup(self, sock: socket.socket) -> None:
        while True:
            (length,) = struct.unpack("!I", _recv_exact(sock, 4))
            body = _recv_exact(sock, length - 4)
            (proto,) = struct.unpack("!I", body[:4])
            if proto == _SSL_REQUEST:
                sock.sendall(b"N")  # TLS not supported (server.zig SSLRequest)
                continue
            if proto == _CANCEL_REQUEST:
                raise ConnectionError("cancel request")
            break  # StartupMessage; parameters ignored (no auth, like ref dev mode)
        sock.sendall(_msg(b"R", struct.pack("!I", 0)))  # AuthenticationOk
        for k, v in (("server_version", "14.0 (sydradb-spark)"), ("client_encoding", "UTF8")):
            sock.sendall(_msg(b"S", k.encode() + b"\x00" + v.encode() + b"\x00"))

    @staticmethod
    def _ready(sock: socket.socket) -> None:
        sock.sendall(_msg(b"Z", b"I"))

    @staticmethod
    def _parse_message(sock: socket.socket, payload: bytes) -> None:
        """Extended-protocol Parse ('P'): validate the frame and answer the
        reference's TARGETED errors (compat/wire/server.zig:184-247) instead
        of a generic unsupported-tag response — psycopg3-default connections
        see '0A000 extended protocol not implemented yet' for translatable
        SQL, the translator's own sqlstate for untranslatable SQL, and
        '08P01' for malformed frames."""
        from sydradb_spark.compat.translator import translate

        def _cstring(buf: bytes, off: int) -> tuple[str, int]:
            end = buf.index(b"\x00", off)
            return buf[off:end].decode("utf-8", "replace"), end + 1

        try:
            _name, off = _cstring(payload, 0)
            sql, off = _cstring(payload, off)
        except ValueError:
            sock.sendall(_error_response("malformed parse message", "08P01"))
            return
        if len(payload) < off + 2:
            sock.sendall(_error_response("parse message truncated", "08P01"))
            return
        (n_params,) = struct.unpack("!H", payload[off : off + 2])
        if len(payload) < off + 2 + n_params * 4:
            sock.sendall(_error_response("parse message truncated", "08P01"))
            return
        t = translate(sql.strip())
        if t.ok:
            sock.sendall(
                _error_response("extended protocol not implemented yet", "0A000")
            )
        else:
            sock.sendall(
                _error_response(
                    t.message or "translation failed", t.sqlstate or "0A000"
                )
            )

    @staticmethod
    def _query(sock: socket.socket, server: "PgWireServer", sql: str) -> None:
        from sydradb_spark import metrics
        from sydradb_spark.compat import catalog as pg_catalog
        from sydradb_spark.compat.translator import translate

        metrics.inc("sydra_compat_queries_total")
        if not sql.strip():
            sock.sendall(_msg(b"I", b""))  # EmptyQueryResponse
            return
        if pg_catalog.is_catalog_query(sql):
            # psql \dt / \d and driver type-OID probes: answered from the
            # in-process catalog snapshot (compat/catalog.py), never Spark —
            # metadata lookups are latency-bound, exactly as the reference
            # serves them from its snapshot rather than the storage engine.
            metrics.inc("sydra_compat_catalog_queries_total")
            try:
                fields, rows = server.catalog.execute(sql)
            except Exception as exc:  # noqa: BLE001 — surface as pg error
                sock.sendall(
                    _error_response(str(exc).split("\n")[0][:500], "42P01")
                )
                return
            sock.sendall(_row_description(fields))
            for row in rows:
                sock.sendall(_data_row(list(row)))
            sock.sendall(_msg(b"C", f"SELECT {len(rows)}".encode() + b"\x00"))
            return
        t = translate(sql)
        if not t.ok:
            sock.sendall(_error_response(t.message or "not supported", t.sqlstate or "0A000"))
            return
        import time
        import uuid

        t0 = time.perf_counter()
        try:
            result = server.engine.query(t.sydraql)
            df = result.df.limit(server.max_rows)
            fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001 — surface as pg error
            sock.sendall(_error_response(str(exc).split("\n")[0][:500], "42601"))
            return
        sock.sendall(_row_description(fields))
        for row in rows:
            sock.sendall(_data_row([row[name] for name, _ in fields]))
        from sydradb_spark.api import _plan_stats

        stream_ms = int((time.perf_counter() - t0) * 1000)
        for notice in _diagnostic_notices(
            fields,
            result.stats,
            _plan_stats(df).get("operators", []),
            rows_emitted=len(rows),
            stream_ms=stream_ms,
            trace_id=uuid.uuid4().hex[:16],
        ):
            sock.sendall(notice)
        sock.sendall(_msg(b"C", f"SELECT {len(rows)}".encode() + b"\x00"))


class PgWireServer:
    """Threaded pg wire server over one SydraQLEngine.

    ``port=0`` binds an ephemeral port; ``addr`` reports the bound address.
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0, max_rows: int = 10_000):
        from sydradb_spark.compat.catalog import CatalogStore

        self.engine = engine
        self.max_rows = max_rows
        self.catalog = CatalogStore()  # DuckDB connection opens lazily
        self._tcp = socketserver.ThreadingTCPServer((host, port), _Handler, bind_and_activate=True)
        self._tcp.daemon_threads = True
        self._tcp.pgwire = self  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def addr(self) -> tuple[str, int]:
        return self._tcp.server_address  # type: ignore[return-value]

    def start(self) -> "PgWireServer":
        self._thread = threading.Thread(target=self._tcp.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()
