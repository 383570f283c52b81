"""Shared fixtures: one tuned SparkSession per test session.

Mirrors the reference ITCase pattern (a shared MiniCluster across a
suite — SURVEY.md section 5) with a shared local[*] SparkSession.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from flink_release_1_16_0_spark import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return SF_CORRECT


def retry_on_py4j_flake(fn):
    """Bounded single retry for Spark-session-heavy tests that assert a
    RAISED error: when a second Spark application shares the host (e.g.
    an oracle sweep running beside pytest), the expected Python-side
    error can surface as a py4j connection hiccup instead. Retry once
    on a py4j-shaped failure only; real assertion failures re-raise
    immediately. (Round-8 verification flagged exactly this flake on
    test_null_payload_strict_raises.)"""
    import functools
    import time

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception as exc:  # noqa: BLE001 — classify, retry once, re-raise
            text = f"{type(exc).__module__}.{type(exc).__name__}: {exc}"
            if "py4j" in text.lower() and "Py4JJavaError" not in text:
                time.sleep(2.0)
                return fn(*args, **kwargs)
            raise

    return wrapper
