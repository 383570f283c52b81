"""SQL Gateway tests: session service lifecycle + the v1 REST surface.

Mirrors the reference's SqlGatewayServiceITCase / rest handler tests:
open session -> execute -> poll status -> token-paged fetch -> EOS,
per-session config isolation, error/cancel lifecycles, and the REST
routes end-to-end over a real HTTP socket.
"""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from flink_release_1_16_0_spark.sql_gateway import (
    CANCELED,
    ERROR,
    FINISHED,
    SqlGateway,
    SqlGatewayService,
)


@pytest.fixture(scope="module")
def service(spark):
    return SqlGatewayService(spark)


def _wait_finished(service, sh, oh, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        st = service.get_operation_status(sh, oh)
        if st in (FINISHED, ERROR, CANCELED):
            return st
        time.sleep(0.05)
    raise TimeoutError("operation did not finish")


def _fetch_all(service, sh, oh, max_rows=100):
    rows, token = [], 0
    while True:
        body = service.fetch_results(sh, oh, token, max_rows=max_rows)
        if body["resultType"] == "NOT_READY":
            time.sleep(0.05)
            continue
        rows.extend(tuple(d["fields"]) for d in body["results"]["data"])
        if body["resultType"] == "EOS":
            return rows, body
        token += 1


def test_session_execute_fetch_eos(service):
    sh = service.open_session({}, "it-session")
    oh = service.execute_statement(
        sh, "SELECT id AS k, id * 2 AS v FROM range(5)"
    )
    assert _wait_finished(service, sh, oh) == FINISHED
    # column metadata carries Flink logical type names (first PAYLOAD page)
    first = service.fetch_results(sh, oh, 0)
    cols = first["results"]["columns"]
    assert [c["name"] for c in cols] == ["k", "v"]
    assert cols[0]["logicalType"]["type"] == "BIGINT"
    # page 0 is re-fetchable (retry contract), then pages walk to EOS
    rows, last = _fetch_all(service, sh, oh)
    assert sorted(rows) == [(i, 2 * i) for i in range(5)]
    assert last["resultType"] == "EOS" and last["nextResultUri"] is None
    service.close_session(sh)
    with pytest.raises(KeyError):
        service.get_session_config(sh)


def test_result_paging_and_token_contract(service):
    sh = service.open_session()
    oh = service.execute_statement(sh, "SELECT id FROM range(25)")
    _wait_finished(service, sh, oh)
    p0 = service.fetch_results(sh, oh, 0, max_rows=10)
    assert p0["resultType"] == "PAYLOAD" and len(p0["results"]["data"]) == 10
    # re-fetch of the current page is idempotent (retry contract)
    assert service.fetch_results(sh, oh, 0, max_rows=10) == p0
    p1 = service.fetch_results(sh, oh, 1, max_rows=10)
    p2 = service.fetch_results(sh, oh, 2, max_rows=10)
    p3 = service.fetch_results(sh, oh, 3, max_rows=10)
    assert len(p1["results"]["data"]) == 10 and len(p2["results"]["data"]) == 5
    assert p3["resultType"] == "EOS" and p3["results"]["data"] == []
    # skipping ahead is rejected
    oh2 = service.execute_statement(sh, "SELECT id FROM range(25)")
    _wait_finished(service, sh, oh2)
    with pytest.raises(ValueError, match="token"):
        service.fetch_results(sh, oh2, 2, max_rows=10)
    service.close_session(sh)


def test_ddl_then_query_same_session_and_isolation(service, spark, tmp_path):
    spark.range(0, 7).selectExpr("id AS x").write.parquet(str(tmp_path / "gw"))
    sh1 = service.open_session({"k1": "v1"})
    sh2 = service.open_session()
    oh = service.execute_statement(
        sh1,
        f"""CREATE TABLE gw_t (x BIGINT) WITH (
            'connector'='filesystem','path'='{tmp_path}/gw','format'='parquet')""",
    )
    _wait_finished(service, sh1, oh)
    oh = service.execute_statement(sh1, "SELECT COUNT(*) AS n FROM gw_t")
    _wait_finished(service, sh1, oh)
    rows, _ = _fetch_all(service, sh1, oh)
    assert rows == [(7,)]
    # session config: opening properties + SET statements both visible
    oh = service.execute_statement(sh1, "SET 'pipeline.name'='gw-test'")
    _wait_finished(service, sh1, oh)
    cfg = service.get_session_config(sh1)
    assert cfg["k1"] == "v1" and cfg["pipeline.name"] == "gw-test"
    assert "pipeline.name" not in service.get_session_config(sh2)
    # catalog introspection
    assert service.get_current_catalog(sh1) == "default_catalog"
    assert "default_catalog" in service.list_catalogs(sh1)
    assert "gw_t" in service.list_tables(sh1, "default_catalog", "default_database")
    service.close_session(sh1)
    service.close_session(sh2)


def test_pipelined_statements_run_in_submission_order(service, spark, tmp_path):
    """Two statements submitted back-to-back WITHOUT polling must run in
    submission order (review finding: a bare lock serialized but did not
    order) — the dependent INSERT sees the table its predecessor
    creates."""
    spark.range(0, 3).selectExpr("id AS x").write.parquet(str(tmp_path / "src"))
    sh = service.open_session()
    handles = [
        service.execute_statement(
            sh,
            f"""CREATE TABLE gw_fifo (x BIGINT) WITH (
                'connector'='filesystem','path'='{tmp_path}/fifo','format'='parquet')""",
        ),
        service.execute_statement(
            sh, f"INSERT INTO gw_fifo SELECT x FROM parquet.`{tmp_path}/src`"
        ),
        service.execute_statement(sh, "SELECT COUNT(*) AS n FROM gw_fifo"),
    ]
    for oh in handles:
        assert _wait_finished(service, sh, oh) == FINISHED
    rows, _ = _fetch_all(service, sh, handles[-1])
    assert rows == [(3,)]
    service.close_session(sh)


def test_error_and_cancel_lifecycle(service):
    sh = service.open_session()
    oh = service.execute_statement(sh, "SELECT FROM nowhere !!")
    assert _wait_finished(service, sh, oh) == ERROR
    with pytest.raises(RuntimeError):
        service.fetch_results(sh, oh, 0)
    oh2 = service.execute_statement(sh, "SELECT 1 AS one")
    service.cancel_operation(sh, oh2)
    assert service.get_operation_status(sh, oh2) in (CANCELED, FINISHED)
    oh3 = service.execute_statement(sh, "SELECT 1 AS one")
    _wait_finished(service, sh, oh3)
    service.close_operation(sh, oh3)
    with pytest.raises(KeyError):
        service.get_operation_status(sh, oh3)
    service.close_session(sh)


def test_function_introspection(service):
    sh = service.open_session()
    assert service.list_user_defined_functions(sh) == []
    oh = service.execute_statement(
        sh,
        "CREATE TEMPORARY FUNCTION gw_shout AS "
        "'flink_release_1_16_0_spark.functions.examples.shout' RETURNS string",
    )
    _wait_finished(service, sh, oh)
    assert service.list_user_defined_functions(sh) == ["gw_shout"]
    sysfns = service.list_system_functions(sh)
    assert "split_index" in sysfns  # a Flink-spelled built-in rides along
    oh = service.execute_statement(sh, "DROP TEMPORARY FUNCTION gw_shout")
    _wait_finished(service, sh, oh)
    assert service.list_user_defined_functions(sh) == []
    service.close_session(sh)


def _rest(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_rest_endpoint_end_to_end(spark):
    gw = SqlGateway(spark).start()
    try:
        base = gw.url
        assert _rest(f"{base}/v1/api_versions")["versions"] == ["V1"]
        info = _rest(f"{base}/v1/info")
        assert info["productName"] == "Apache Flink" and info["version"] == "1.16.0"
        sh = _rest(
            f"{base}/v1/sessions", "POST",
            {"sessionName": "rest-it", "properties": {"a": "b"}},
        )["sessionHandle"]
        assert _rest(f"{base}/v1/sessions/{sh}")["properties"]["a"] == "b"
        _rest(f"{base}/v1/sessions/{sh}/heartbeat", "POST", {})
        oh = _rest(
            f"{base}/v1/sessions/{sh}/statements", "POST",
            {"statement": "SELECT id AS n FROM range(3)"},
        )["operationHandle"]
        for _ in range(200):
            st = _rest(f"{base}/v1/sessions/{sh}/operations/{oh}/status")["status"]
            if st == "FINISHED":
                break
            time.sleep(0.05)
        assert st == "FINISHED"
        rows, token = [], 0
        while True:
            page = _rest(
                f"{base}/v1/sessions/{sh}/operations/{oh}/result/{token}?maxRows=2"
            )
            rows += [d["fields"][0] for d in page["results"]["data"]]
            if page["resultType"] == "EOS":
                break
            assert page["nextResultUri"].endswith(f"/result/{token + 1}")
            token += 1
        assert sorted(rows) == [0, 1, 2]
        assert _rest(f"{base}/v1/sessions/{sh}", "DELETE")["status"] == "CLOSED"
        # 404 surfaces for the closed session
        with pytest.raises(urllib.error.HTTPError) as ei:
            _rest(f"{base}/v1/sessions/{sh}")
        assert ei.value.code == 404
    finally:
        gw.stop()


def test_session_catalog_isolation(service):
    """Two sessions creating the same table name must not clobber each
    other (SessionContext holds per-session catalog state): each session
    rides its own spark.newSession() child."""
    a = service.open_session({}, "iso-a")
    b = service.open_session({}, "iso-b")
    try:
        oh = service.execute_statement(
            a, "CREATE VIEW iso_t AS SELECT 1 AS v"
        )
        _wait_finished(service, a, oh)
        oh = service.execute_statement(
            b, "CREATE VIEW iso_t AS SELECT 2 AS v"
        )
        _wait_finished(service, b, oh)
        oh_a = service.execute_statement(a, "SELECT v FROM iso_t")
        oh_b = service.execute_statement(b, "SELECT v FROM iso_t")
        assert _wait_finished(service, a, oh_a) == FINISHED
        assert _wait_finished(service, b, oh_b) == FINISHED
        ra = service.fetch_results(a, oh_a, 0)["results"]["data"]
        rb = service.fetch_results(b, oh_b, 0)["results"]["data"]
        assert ra[0]["fields"] == [1]
        assert rb[0]["fields"] == [2]
    finally:
        service.close_session(a)
        service.close_session(b)


def test_close_session_cancels_pending(service):
    """Statements still queued when the session closes are CANCELED, not
    executed against the closed session. Deterministic: a blocker task
    occupies the single session worker until we release it, so the
    statement submitted behind it is provably PENDING at close time."""
    import threading

    sh = service.open_session({}, "close-pending")
    session = service._session(sh)
    gate = threading.Event()
    session.submit(gate.wait)  # occupies the FIFO worker
    pending = service.execute_statement(sh, "SELECT 1 AS one")
    op = session.operations[pending]
    assert op.status == "PENDING"
    service.close_session(sh)
    assert op.status == CANCELED  # canceled BEFORE the worker reaches it
    gate.set()  # release the worker; _run_operation must no-op
    assert op.done.wait(5)
    assert op.status == CANCELED and op.rows == []


def test_cancel_echoes_actual_status(spark):
    """POST .../cancel on a FINISHED operation reports FINISHED (the
    reference's cancel of a terminal op is a no-op)."""
    gw = SqlGateway(spark).start()
    try:
        base = gw.url
        sh = _rest(f"{base}/v1/sessions", "POST", {})["sessionHandle"]
        oh = _rest(
            f"{base}/v1/sessions/{sh}/statements", "POST",
            {"statement": "SELECT 1 AS one"},
        )["operationHandle"]
        for _ in range(200):
            st = _rest(f"{base}/v1/sessions/{sh}/operations/{oh}/status")["status"]
            if st == "FINISHED":
                break
            time.sleep(0.05)
        assert st == "FINISHED"
        out = _rest(f"{base}/v1/sessions/{sh}/operations/{oh}/cancel", "POST", {})
        assert out["status"] == "FINISHED"
        _rest(f"{base}/v1/sessions/{sh}", "DELETE")
    finally:
        gw.stop()


def test_hiveserver2_endpoint_dependency_probe():
    """1.16's SECOND gateway wire protocol — the HiveServer2 endpoint
    (flink-connectors/flink-connector-hive/.../endpoint/hive/
    HiveServer2Endpoint.java:153) — speaks the Hive Thrift RPC
    (TCLIService). Like the Kafka transport, it is environment-blocked
    here: no thrift runtime or hive-service bindings ship in this
    container, and pip installs are off-limits, so an implementation
    could never be driven end to end. This probe documents that honestly
    (the same pattern as the Kafka jar probe): it SKIPS while the
    dependency is absent, and FAILS LOUDLY if a thrift runtime ever
    appears — at which point the gap becomes actionable and this test
    must be replaced by a real endpoint + test."""
    try:
        import thrift  # noqa: F401
    except ImportError:
        pytest.skip(
            "thrift runtime not available: HiveServer2 endpoint is "
            "environment-blocked (documented in COVERAGE.md)"
        )
    raise AssertionError(
        "a thrift runtime is now available — implement the HiveServer2 "
        "endpoint (HiveServer2Endpoint.java:153) instead of skipping"
    )
