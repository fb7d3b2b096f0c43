from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bran_spark.fixtures.gen import ensure, fixture_dir  # noqa: E402
from bran_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bran_spark_tests", master="local[4]", shuffle_partitions="8")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx_dir() -> str:
    ensure(0.001)
    return fixture_dir(0.001)


@pytest.fixture(scope="session")
def testdata_dir() -> str:
    return TESTDATA
