from __future__ import annotations

import os

import pytest

from fluent_bit_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fbs-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Operators register persisted intermediates with cache.track();
    releasing after every test keeps the storage layer clean so
    cache-lifecycle assertions in one test aren't polluted by another."""
    yield
    from fluent_bit_spark import cache

    cache.release_all()
