"""SQL Gateway: session service + REST endpoint (v1 wire surface).

Reference parity: ``flink-table/flink-sql-gateway`` — the service tier
(``service/SqlGatewayServiceImpl.java``, ``session/SessionManager.java``,
``operation/OperationManager.java``, ``result/ResultFetcher.java``) and
the 1.16 REST endpoint (``rest/SqlGatewayRestEndpoint.java`` with the
v1 routes declared in ``rest/header/**``: POST /sessions,
GET|DELETE /sessions/:h, POST /sessions/:h/heartbeat,
POST /sessions/:h/statements, GET /sessions/:h/operations/:op/status,
POST .../cancel, POST .../close, GET .../result/:token, GET /info,
GET /api_versions). Operation lifecycle per
``api/operation/OperationStatus.java`` (PENDING -> RUNNING ->
FINISHED | ERROR | CANCELED | CLOSED).

Spark-first shape: each session owns its own
:class:`~flink_release_1_16_0_spark.table_env.TableEnvironment` over a
``spark.newSession()`` child of the gateway's SparkSession — Spark's
per-session isolation of temp views, registered functions, and SQLConf
over one shared SparkContext/cache is exactly the reference's
SessionContext holding per-session catalog/config state over one
cluster (``SessionContext.java``); two sessions creating a table with
the same name no longer clobber each other. Persistent-catalog objects
(``spark_catalog`` / Hive metastore tables) remain shared, as they are
in the reference. Statements run on a worker
thread (OperationManager's async submission) and results materialize
into a token-paged ResultSet exactly like ResultFetcher — each token is
re-fetchable once for retry, ``resultType`` walks NOT_READY -> PAYLOAD*
-> EOS. The REST tier is stdlib ``http.server`` (jar-free), speaking the
v1 JSON bodies (``rest/message/**``: sessionHandle / operationHandle /
columns+data ResultSet with Flink logical-type names).
"""

from __future__ import annotations

import json
import queue
import re
import threading
import uuid
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession

from flink_release_1_16_0_spark.table_env import TableEnvironment

VERSION = "1.16.0"
API_VERSIONS = ["V1"]

# OperationStatus.java:38-50
PENDING, RUNNING, FINISHED, ERROR, CANCELED, CLOSED = (
    "PENDING", "RUNNING", "FINISHED", "ERROR", "CANCELED", "CLOSED",
)

# spark simpleString -> Flink LogicalType root name
# (LogicalTypeJsonSerializer.java's type names)
_TYPE_MAP = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "boolean": "BOOLEAN",
    "string": "VARCHAR",
    "binary": "VARBINARY",
    "date": "DATE",
    "timestamp": "TIMESTAMP_LTZ",
    "timestamp_ntz": "TIMESTAMP",
}


def _flink_type(spark_type: str) -> str:
    t = spark_type.lower()
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return f"DECIMAL({m.group(1)}, {m.group(2)})"
    if t.startswith(("array", "map", "struct")):
        return t.upper()
    return _TYPE_MAP.get(t, t.upper())


class _Operation:
    """One submitted statement (OperationManager.Operation): a worker
    thread drives PENDING -> RUNNING -> terminal; results land in a
    token-paged store (ResultStore)."""

    def __init__(self) -> None:
        self.handle = str(uuid.uuid4())
        self.status = PENDING
        self.error: str | None = None
        self.columns: list[dict] = []
        self.rows: list[list] = []
        self.is_query = False
        self.next_token = 0
        self.offset = 0  # rows consumed by pages 0..next_token-1
        self.last_page: tuple[int, dict] | None = None
        self.lock = threading.Lock()
        self.done = threading.Event()


class Session:
    """Session.java / SessionContext: per-session TableEnvironment +
    effective config + live operations."""

    def __init__(self, spark: SparkSession, name: str, properties: dict[str, str]):
        self.handle = str(uuid.uuid4())
        self.name = name
        self.properties = dict(properties)
        streaming = properties.get("execution.runtime-mode", "batch").lower() == "streaming"
        # catalog isolation (SessionContext.java): a newSession() child
        # shares the SparkContext + cached data but owns its temp views,
        # function registry, and SQLConf — CREATE TABLE in session A is
        # invisible to session B
        self.spark = spark.newSession()
        self.tenv = TableEnvironment.create(self.spark, streaming=streaming)
        for k, v in properties.items():
            self.tenv._config[k] = v
        self.operations: dict[str, _Operation] = {}
        # OperationManager runs a session's operations IN SUBMISSION
        # ORDER on one executor — a plain lock would serialize but not
        # order (two pipelined statements could swap), so each session
        # drains a FIFO work queue on a single daemon worker
        self._work: "queue.Queue" = queue.Queue()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        self._worker.start()

    def _drain(self) -> None:
        while True:
            task = self._work.get()
            if task is None:
                return
            task()

    def submit(self, task) -> None:
        self._work.put(task)

    def close(self) -> None:
        # cancel not-yet-started statements before the stop sentinel so
        # work submitted before close() does not run against a closed
        # session (_run_operation returns immediately on non-PENDING)
        for op in list(self.operations.values()):
            with op.lock:
                if op.status == PENDING:
                    op.status = CANCELED
                    op.done.set()
        self._work.put(None)


class SqlGatewayService:
    """SqlGatewayServiceImpl + SessionManager over one SparkSession."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._sessions: dict[str, Session] = {}
        self._lock = threading.Lock()

    # -- sessions (SessionManager.java) --------------------------------------

    def open_session(self, properties: dict[str, str] | None = None, session_name: str = "") -> str:
        s = Session(self.spark, session_name, properties or {})
        with self._lock:
            self._sessions[s.handle] = s
        return s.handle

    def _session(self, handle: str) -> Session:
        s = self._sessions.get(handle)
        if s is None:
            raise KeyError(f"unknown session handle {handle!r}")
        return s

    def close_session(self, handle: str) -> None:
        s = self._session(handle)
        s.close()
        with self._lock:
            del self._sessions[handle]

    def get_session_config(self, handle: str) -> dict[str, str]:
        s = self._session(handle)
        # live view: SET statements executed in the session show up
        return {**s.properties, **s.tenv._config}

    # -- statements (OperationManager.java) -----------------------------------

    def execute_statement(self, session_handle: str, statement: str) -> str:
        s = self._session(session_handle)
        op = _Operation()
        s.operations[op.handle] = op
        # enqueue on the session's FIFO worker: pipelined statements
        # execute in submission order, like OperationManager
        s.submit(lambda: self._run_operation(s, op, statement))
        return op.handle

    def _run_operation(self, s: Session, op: _Operation, statement: str) -> None:
        with op.lock:
            if op.status != PENDING:  # canceled before start
                return
            op.status = RUNNING
        try:
            result = s.tenv.execute_sql(statement)
            df = result.to_data_frame()
            if df is not None:
                op.is_query = True
                op.columns = [
                    {
                        "name": f.name,
                        "logicalType": {
                            "type": _flink_type(f.dataType.simpleString()),
                            "nullable": f.nullable,
                        },
                        "comment": None,
                    }
                    for f in df.schema.fields
                ]
                op.rows = [
                    [_json_value(v) for v in row] for row in df.collect()
                ]
            else:
                rows = result.collect()
                op.columns = [
                    {
                        "name": "result",
                        "logicalType": {"type": "VARCHAR", "nullable": True},
                        "comment": None,
                    }
                ]
                op.rows = [[_json_value(r)] for r in rows]
            with op.lock:
                if op.status == RUNNING:
                    op.status = FINISHED
        except Exception as exc:  # surfaced through getOperationStatus/fetch
            op.error = f"{type(exc).__name__}: {exc}"
            with op.lock:
                if op.status == RUNNING:
                    op.status = ERROR
        finally:
            op.done.set()

    def _operation(self, session_handle: str, op_handle: str) -> _Operation:
        s = self._session(session_handle)
        op = s.operations.get(op_handle)
        if op is None:
            raise KeyError(f"unknown operation handle {op_handle!r}")
        return op

    def get_operation_status(self, session_handle: str, op_handle: str) -> str:
        return self._operation(session_handle, op_handle).status

    def cancel_operation(self, session_handle: str, op_handle: str) -> None:
        op = self._operation(session_handle, op_handle)
        with op.lock:
            if op.status in (PENDING, RUNNING):
                op.status = CANCELED
                op.done.set()

    def close_operation(self, session_handle: str, op_handle: str) -> None:
        op = self._operation(session_handle, op_handle)
        with op.lock:
            op.status = CLOSED
        s = self._session(session_handle)
        del s.operations[op_handle]

    # -- results (ResultFetcher.java) -----------------------------------------

    def fetch_results(
        self,
        session_handle: str,
        op_handle: str,
        token: int,
        max_rows: int = 100,
    ) -> dict:
        """Token-paged fetch. Token 0..N must be requested in order;
        re-fetching the CURRENT page is allowed (the reference's retry
        contract — ResultStore keeps the last returned page). Returns
        the FetchResultsResponseBody shape: resultType NOT_READY while
        the operation runs, then PAYLOAD pages, then EOS (empty data,
        no nextResultUri)."""
        op = self._operation(session_handle, op_handle)
        if op.status == ERROR:
            raise RuntimeError(op.error or "operation failed")
        if op.status in (CANCELED, CLOSED):
            raise RuntimeError(f"operation is {op.status}")
        base = f"/v1/sessions/{session_handle}/operations/{op_handle}/result"
        if op.status in (PENDING, RUNNING):
            return {
                "resultType": "NOT_READY",
                "isQueryResult": False,
                "results": {"columns": [], "data": []},
                "nextResultUri": f"{base}/{token}",
            }
        with op.lock:
            if op.last_page is not None and token == op.last_page[0]:
                return op.last_page[1]  # idempotent retry of the current page
            if token != op.next_token:
                raise ValueError(
                    f"expected token {op.next_token}, got {token} "
                    "(tokens are fetched in order; only the current page may be retried)"
                )
            # each page continues where the previous ended, whatever
            # maxRows the previous request used (ResultFetcher pages are
            # independent of any single request's size)
            start = op.offset
            page_rows = op.rows[start : start + max_rows]
            eos = start >= len(op.rows)
            body = {
                "resultType": "EOS" if eos else "PAYLOAD",
                "isQueryResult": op.is_query,
                "results": {
                    "columns": op.columns,
                    "data": [{"kind": "INSERT", "fields": r} for r in page_rows],
                },
                "nextResultUri": None if eos else f"{base}/{token + 1}",
            }
            if not eos:
                op.next_token = token + 1
                op.offset = start + len(page_rows)
            op.last_page = (token, body)
            return body

    # -- catalog introspection (SqlGatewayService.java:206-249) ---------------

    def get_current_catalog(self, session_handle: str) -> str:
        return self._session(session_handle).tenv._current_catalog

    def list_catalogs(self, session_handle: str) -> list[str]:
        return sorted(self._session(session_handle).tenv._catalogs)

    def list_databases(self, session_handle: str, catalog: str) -> list[str]:
        tenv = self._session(session_handle).tenv
        if catalog not in tenv._databases:
            raise KeyError(f"unknown catalog {catalog!r}")
        return sorted(tenv._databases[catalog])

    def list_tables(self, session_handle: str, catalog: str, database: str) -> list[str]:
        tenv = self._session(session_handle).tenv
        return sorted(
            n
            for n, t in tenv._tables.items()
            if t.catalog == catalog and t.database == database
        )

    def list_system_functions(self, session_handle: str) -> list[str]:
        """SqlGatewayService.listSystemFunctions:271 — the built-in
        function namespace (the engine's Flink-spelled SQL UDFs ride the
        session catalog alongside Spark's own built-ins)."""
        s = self._session(session_handle)
        return sorted(f.name for f in s.tenv.spark.catalog.listFunctions())

    def list_user_defined_functions(self, session_handle: str) -> list[str]:
        """SqlGatewayService.listUserDefinedFunctions:261 — functions the
        session created via CREATE [TEMPORARY] FUNCTION DDL."""
        return sorted(self._session(session_handle).tenv._created_functions)

    def get_gateway_info(self) -> dict:
        return {"productName": "Apache Flink", "version": VERSION}


def _json_value(v: Any):
    """JSON-safe cell encoding (JsonResultSetSerializer's scalar cases)."""
    import datetime
    import decimal

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (list, tuple)):
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_value(x) for k, x in v.items()}
    if hasattr(v, "asDict"):
        return {k: _json_value(x) for k, x in v.asDict().items()}
    return str(v)


# ---------------------------------------------------------------------------
# REST endpoint (SqlGatewayRestEndpoint.java, v1 routes)
# ---------------------------------------------------------------------------

_ROUTES: list[tuple[str, re.Pattern, str]] = [
    ("GET", re.compile(r"/v1/api_versions$"), "api_versions"),
    ("GET", re.compile(r"/v1/info$"), "info"),
    ("POST", re.compile(r"/v1/sessions$"), "open_session"),
    ("GET", re.compile(r"/v1/sessions/(?P<s>[\w-]+)$"), "session_config"),
    ("DELETE", re.compile(r"/v1/sessions/(?P<s>[\w-]+)$"), "close_session"),
    ("POST", re.compile(r"/v1/sessions/(?P<s>[\w-]+)/heartbeat$"), "heartbeat"),
    ("POST", re.compile(r"/v1/sessions/(?P<s>[\w-]+)/statements$"), "execute"),
    (
        "GET",
        re.compile(r"/v1/sessions/(?P<s>[\w-]+)/operations/(?P<o>[\w-]+)/status$"),
        "op_status",
    ),
    (
        "POST",
        re.compile(r"/v1/sessions/(?P<s>[\w-]+)/operations/(?P<o>[\w-]+)/cancel$"),
        "op_cancel",
    ),
    (
        "POST",
        re.compile(r"/v1/sessions/(?P<s>[\w-]+)/operations/(?P<o>[\w-]+)/close$"),
        "op_close",
    ),
    (
        "GET",
        re.compile(
            r"/v1/sessions/(?P<s>[\w-]+)/operations/(?P<o>[\w-]+)/result/(?P<t>\d+)$"
        ),
        "fetch",
    ),
]


class SqlGatewayRestEndpoint:
    """The v1 REST surface over :class:`SqlGatewayService` on stdlib
    ``http.server`` (the reference embeds Netty; the routes and JSON
    bodies are the parity surface, not the web stack)."""

    def __init__(self, service: SqlGatewayService, host: str = "127.0.0.1", port: int = 0):
        self.service = service
        self._httpd = None
        self._thread = None
        self.host, self.port = host, port

    def start(self) -> "SqlGatewayRestEndpoint":
        import http.server

        service = self.service

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, body: dict) -> None:
                payload = json.dumps(body).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _dispatch(self, method: str) -> None:
                from urllib.parse import parse_qs, urlparse

                url = urlparse(self.path)
                for m, pat, name in _ROUTES:
                    if m != method:
                        continue
                    match = pat.match(url.path)
                    if not match:
                        continue
                    try:
                        body = {}
                        length = int(self.headers.get("Content-Length") or 0)
                        if length:
                            body = json.loads(self.rfile.read(length) or b"{}")
                        q = parse_qs(url.query)
                        self._send(200, self._handle(name, match, body, q))
                    except (KeyError, ValueError) as exc:
                        self._send(
                            404 if isinstance(exc, KeyError) else 400,
                            {"errors": [str(exc)]},
                        )
                    except Exception as exc:
                        self._send(500, {"errors": [f"{type(exc).__name__}: {exc}"]})
                    return
                self._send(404, {"errors": [f"no route for {method} {url.path}"]})

            def _handle(self, name: str, match: re.Match, body: dict, q: dict) -> dict:
                g = match.groupdict()
                if name == "api_versions":
                    return {"versions": API_VERSIONS}
                if name == "info":
                    return service.get_gateway_info()
                if name == "open_session":
                    h = service.open_session(
                        body.get("properties") or {}, body.get("sessionName") or ""
                    )
                    return {"sessionHandle": h}
                if name == "session_config":
                    return {"properties": service.get_session_config(g["s"])}
                if name == "close_session":
                    service.close_session(g["s"])
                    return {"status": "CLOSED"}
                if name == "heartbeat":
                    service._session(g["s"])  # touch; 404s on unknown
                    return {}
                if name == "execute":
                    stmt = body.get("statement")
                    if not stmt:
                        raise ValueError("missing 'statement'")
                    return {
                        "operationHandle": service.execute_statement(g["s"], stmt)
                    }
                if name == "op_status":
                    return {"status": service.get_operation_status(g["s"], g["o"])}
                if name == "op_cancel":
                    service.cancel_operation(g["s"], g["o"])
                    # echo the actual post-cancel status: cancel of an
                    # already-terminal op is a no-op (FINISHED stays
                    # FINISHED on the wire, like OperationManager)
                    return {"status": service.get_operation_status(g["s"], g["o"])}
                if name == "op_close":
                    service.close_operation(g["s"], g["o"])
                    return {"status": CLOSED}
                if name == "fetch":
                    max_rows = int(q.get("maxRows", ["100"])[0])
                    return service.fetch_results(
                        g["s"], g["o"], int(g["t"]), max_rows
                    )
                raise ValueError(f"unhandled route {name}")

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_DELETE(self):
                self._dispatch("DELETE")

        self._httpd = http.server.ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None


class SqlGateway:
    """SqlGateway.java: service + endpoint lifecycle in one handle."""

    def __init__(self, spark: SparkSession, host: str = "127.0.0.1", port: int = 0):
        self.service = SqlGatewayService(spark)
        self.endpoint = SqlGatewayRestEndpoint(self.service, host, port)

    def start(self) -> "SqlGateway":
        self.endpoint.start()
        return self

    def stop(self) -> None:
        self.endpoint.stop()

    @property
    def url(self) -> str:
        return self.endpoint.url
