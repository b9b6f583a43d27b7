"""Shared test fixtures: one SparkSession per test run (JVM start ~30 s)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from fluss_iceberg_spark.session import get_spark

    s = get_spark(app_name="fluss-iceberg-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
