from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_computing_platform_mapreduce_spark import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("distributed-computing-platform-mapreduce-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_CHECK
