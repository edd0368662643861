"""Shared fixtures: one SparkSession + one DuckDB connection per test run.

The parity tests run at sf0.001 (fast; the driver's gate reruns the same
comparisons at sf0.01). The Spark session uses the engine defaults with a
small shuffle-partition count so the whole suite stays quick on local[N].
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Plan-shape tests monkeypatch builder internals (verify-join hints,
# barrier devices) and must see a FRESH build every call — disable the
# registry's session-scoped built-plan memo for the whole suite. The
# memo itself has its own focused test (test_registry_plan_cache.py,
# which re-enables it locally).
os.environ.setdefault("MCS_PLAN_CACHE", "0")


@pytest.fixture(scope="session")
def spark():
    from mariadb_columnstore_engine_spark.session import get_session

    spark = get_session("mcs-spark-tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    from mariadb_columnstore_engine_spark.oracle import duckdb_connect

    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
