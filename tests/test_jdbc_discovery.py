"""JDBC catalog discovery (SQLSchemaProvider analog, reference
src/sql/schema.rs:19-48). No JDBC driver jar ships in this sandbox, so
the discovery path is proven three ways: the per-dialect discovery SQL
executes on live DuckDB/SQLite catalogs, and a fake-transport
JDBCExecutor (execute() rerouted to an in-process DuckDB connection —
exactly the layer a real JDBC jar would replace) drives
engine.discover() end to end."""

from __future__ import annotations

import duckdb
import pytest

from datafusion_federation_spark.sources.provider import (
    JDBCExecutor, SQLProvider, discovery_sql)
from tests.conftest import TESTDATA


def test_discovery_sql_runs_on_duckdb_information_schema():
    conn = duckdb.connect()
    conn.execute(f"CREATE VIEW orders AS SELECT * FROM "
                 f"read_parquet('{TESTDATA}/orders.parquet')")
    conn.execute("CREATE TABLE dim (k INTEGER)")
    rows = conn.execute(discovery_sql("duckdb")).fetchall()
    names = {t for _, t in rows}
    assert {"orders", "dim"} <= names
    assert all(s == "main" for s, _ in rows)


def test_discovery_sql_runs_on_sqlite_master():
    import sqlite3
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE t1 (a INTEGER)")
    conn.execute("CREATE VIEW v1 AS SELECT a FROM t1")
    rows = conn.execute(discovery_sql("sqlite")).fetchall()
    assert {(None, "t1"), (None, "v1")} <= set(rows)


def test_discovery_sql_postgres_excludes_system_schemas():
    s = discovery_sql("postgres")
    assert "pg_catalog" in s and "information_schema.tables" in s
    assert "NOT IN" in s


class _FakeJDBC(JDBCExecutor):
    """JDBCExecutor with the Spark-JDBC transport swapped for an
    in-process DuckDB connection. table_names()/get_table_schema() are
    INHERITED — only the wire layer is faked, so discovery runs the real
    code path a JDBC jar would."""

    def __init__(self, conn):
        super().__init__(url="jdbc:fake://remote", name="fakejdbc",
                         dialect="duckdb")
        self._conn = conn

    def execute(self, spark, sql, schema=None, partitioned=True):
        self.partitioned_calls = getattr(self, "partitioned_calls", [])
        self.partitioned_calls.append(partitioned)
        arrow = self._conn.execute(sql).fetch_arrow_table()
        self._record(sql, 0.0, arrow.num_rows)
        if arrow.num_rows == 0 and schema is not None:
            return spark.createDataFrame([], schema)
        if arrow.num_rows == 0:
            from pyspark.sql.pandas.types import from_arrow_schema
            return spark.createDataFrame([], from_arrow_schema(arrow.schema))
        return spark.createDataFrame(arrow)


def test_engine_discover_via_jdbc_executor(spark):
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.expressions import agg, col, lit

    conn = duckdb.connect()
    for t in ("orders", "customer"):
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{TESTDATA}/{t}.parquet')")
    ex = _FakeJDBC(conn)
    eng = FederationEngine(spark)
    handles = eng.discover(SQLProvider(ex))
    assert {h.local_name for h in handles} == {"orders", "customer"}
    # schemas came through the WHERE 1=0 introspection
    by_name = {h.local_name: h for h in handles}
    assert "o_orderkey" in [f.name for f in by_name["orders"].schema.fields]

    # a federated join over the discovered tables collapses to one query
    b = (eng.table("orders")
         .filter(col("o_totalprice") > lit(100000))
         .join(eng.table("customer"),
               on=col("o_custkey") == col("c_custkey"))
         .group_by("c_mktsegment")
         .agg(agg("count").alias("n")))
    got = {(r["c_mktsegment"], r["n"]) for r in b.to_df().collect()}
    want = set(map(tuple, conn.execute(
        "SELECT c_mktsegment, COUNT(*) FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 100000 GROUP BY c_mktsegment").fetchall()))
    assert got == want
    # the whole join shipped as ONE remote SQL over the fake transport
    assert "JOIN" in ex.metrics()["last_sql"].upper()


def test_jdbc_table_names_requires_active_session():
    ex = JDBCExecutor(url="jdbc:x://nowhere")
    from pyspark.sql import SparkSession
    if SparkSession.getActiveSession() is None:
        with pytest.raises(RuntimeError, match="active SparkSession"):
            ex.table_names()


def test_multi_provider_first_match_wins(spark):
    """MultiSchemaProvider parity (reference src/sql/schema.rs:131-138):
    overlapping table names across two live providers resolve to the
    FIRST registered provider; non-overlapping names still reach the
    second."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import DuckDBExecutor

    c1 = duckdb.connect()
    c1.execute("CREATE TABLE shared AS SELECT 1 AS src, 'one' AS tag")
    c2 = duckdb.connect()
    c2.execute("CREATE TABLE shared AS SELECT 2 AS src, 'two' AS tag")
    c2.execute("CREATE TABLE only2 AS SELECT 42 AS v")

    ex1 = DuckDBExecutor(name="p1", compute_context="multi1")
    ex1.conn = c1
    ex1._tables = {"shared": "inline"}
    ex2 = DuckDBExecutor(name="p2", compute_context="multi2")
    ex2.conn = c2
    ex2._tables = {"shared": "inline", "only2": "inline"}

    eng = FederationEngine(spark)
    eng.discover(SQLProvider(ex1))
    eng.discover(SQLProvider(ex2))

    assert eng.catalog.table("shared").provider.name == "p1"
    assert eng.catalog.table("only2").provider.name == "p2"
    rows = eng.table("shared").select("src").to_df().collect()
    assert [r["src"] for r in rows] == [1], "first provider's data wins"
    rows = eng.table("only2").select("v").to_df().collect()
    assert [r["v"] for r in rows] == [42]


def test_discovery_bypasses_partitioned_reader(spark):
    """A partitioning-configured JDBC executor must NOT route catalog /
    introspection queries through the partitioned reader: the
    partitionColumn does not exist in an information_schema result."""
    from datafusion_federation_spark.sources.provider import (
        JDBCPartitioning)
    conn = duckdb.connect()
    conn.execute(f"CREATE VIEW orders AS SELECT * FROM "
                 f"read_parquet('{TESTDATA}/orders.parquet')")
    ex = _FakeJDBC(conn)
    ex.partitioning = JDBCPartitioning("o_orderkey", 0, 1000, 4)
    names = ex.table_names()
    assert any(n.endswith("orders") for n in names)
    sch = ex.get_table_schema(spark, "orders")
    assert "o_orderkey" in [f.name for f in sch.fields]
    assert ex.partitioned_calls == [False, False]
