from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from openmetrics_spark.session import get_spark

    # fewer threads than CI default: tiny data, JVM startup dominates
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_pinned_caches():
    """Queries pin() persisted intermediates they cannot unpersist
    before their lazy result is consumed; drop them after each test so
    cached partitions don't pile up across the session-scoped Spark."""
    yield
    from openmetrics_spark.tables import release_caches

    release_caches()
