"""Shared fixtures.

One session-scoped SparkSession (cold start ~15 s) shared by every test
that needs Spark; unparser/federation-shape/table-reference tests are pure
Python and never touch it.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (SparkSession.builder.master("local[8]")
         .appName("federation_tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def duckdb_engine(spark):
    """FederationEngine with orders/customer/nation on a DuckDB 'remote'
    and lineitem as a local parquet table (the reference two-engine demo
    shape, examples/df-csv-advanced.rs)."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)

    ex = DuckDBExecutor(name="duckdb_test", compute_context="fixture")
    for t in ("orders", "customer", "nation"):
        ex.register_parquet(t, f"{TESTDATA}/{t}.parquet")
    eng = FederationEngine(spark)
    prov = SQLProvider(ex)
    for t in ("orders", "customer", "nation"):
        eng.register_remote(prov, t)
    eng.register_local_parquet("lineitem", f"{TESTDATA}/lineitem.parquet")
    return eng, ex
