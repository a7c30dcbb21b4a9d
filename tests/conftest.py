from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixels_spark.session import build_session

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="pixels_spark_tests",
        master="local[8]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("PIXELS_SPARK_TEST_SF_DIR", SF_SMOKE)


@pytest.fixture(autouse=True)
def _clear_cache_between_tests(request):
    """Drop cached DataFrames after every test: several operators persist
    small frames as part of their returned lazy plans (co-moment matrices,
    value-grain counts, edge sets) and can't unpersist them before the
    caller executes — across a 1000-test session on the 4 GB test driver
    those orphaned caches accumulate until the deliberately
    memory-constrained spill test OOMs the shared JVM (observed: heap
    exhaustion in test_spill after ~18k stages). Per-test clearCache keeps
    each test's own reuse intact while bounding cross-test accumulation."""
    yield
    spark_fixture = request.node.funcargs.get("spark")
    if spark_fixture is not None:
        try:
            spark_fixture.catalog.clearCache()
        except Exception:
            pass
