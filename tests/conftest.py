from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_lakehouse_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def path_edges(spark, n):
    """Symmetric edge set of the path 0-1-...-(n-1): worst-case diameter,
    so iterative graph loops actually run many rounds. Shared by the
    checkpoint lifecycle and failure-domain suites (r10 review: two
    copies of a load-bearing graph builder can silently diverge)."""
    half = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src LONG, dst LONG"
    )
    return half.unionByName(half.selectExpr("dst AS src", "src AS dst"))
