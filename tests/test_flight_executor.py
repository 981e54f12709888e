"""FlightSQLExecutor: the reference's third named executor dialect
('flight', src/sql/executor.rs:32-33). An in-process Arrow Flight server
backed by DuckDB serves do_get(Ticket=SQL) / list_flights / get_schema,
so the executor's REAL network path (gRPC, Arrow IPC on the wire) is
exercised end to end: discovery, schema introspection, and a federated
join collapsing to one remote SQL."""

from __future__ import annotations

import threading

import duckdb
import pyarrow.flight as fl
import pytest

from datafusion_federation_spark.federation import federate
from datafusion_federation_spark.plans.nodes import (
    RemoteQueryNode, walk_plan)
from datafusion_federation_spark.sources.provider import (
    FlightSQLExecutor, SQLProvider)
from tests.conftest import TESTDATA


# the server implementation is the package's own reusable in-process
# Flight server (sources/flight_server.py) — shared with q77 and the
# demo so the three can't drift
from datafusion_federation_spark.sources.flight_server import (  # noqa: E402
    DuckDBFlightServer as _DuckFlightServer)


@pytest.fixture()
def flight_engine(spark):
    from datafusion_federation_spark.engine import FederationEngine

    conn = duckdb.connect()
    for t in ("orders", "customer"):
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{TESTDATA}/{t}.parquet')")
    server = _DuckFlightServer(conn)
    ex = FlightSQLExecutor(f"grpc://127.0.0.1:{server.port}",
                           name="flight_test", dialect="duckdb")
    eng = FederationEngine(spark)
    prov = SQLProvider(ex)
    yield eng, prov, ex, conn
    server.shutdown()


def test_flight_discovery_and_schema(spark, flight_engine):
    eng, prov, ex, conn = flight_engine
    handles = eng.discover(prov)
    assert {h.local_name for h in handles} == {"orders", "customer"}
    sch = ex.get_table_schema(spark, "orders")
    assert "o_orderkey" in [f.name for f in sch.fields]


def test_flight_federated_join_one_remote_query(spark, flight_engine):
    from datafusion_federation_spark.expressions import agg, col, lit

    eng, prov, ex, conn = flight_engine
    eng.discover(prov)
    b = (eng.table("orders")
         .filter(col("o_totalprice") > lit(100000))
         .join(eng.table("customer"),
               on=col("o_custkey") == col("c_custkey"))
         .group_by("c_mktsegment")
         .agg(agg("count").alias("n")))
    fed = federate(b.plan)
    remotes = [n for n in walk_plan(fed) if isinstance(n, RemoteQueryNode)]
    assert len(remotes) == 1, "join+agg must collapse to ONE Flight call"
    got = {(r["c_mktsegment"], r["n"]) for r in b.to_df().collect()}
    want = set(map(tuple, conn.execute(
        "SELECT c_mktsegment, COUNT(*) FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 100000 GROUP BY c_mktsegment").fetchall()))
    assert got == want
    assert "JOIN" in ex.metrics()["last_sql"].upper()


def test_flight_empty_result_keeps_schema(spark, flight_engine):
    from datafusion_federation_spark.expressions import col, lit

    eng, prov, ex, conn = flight_engine
    eng.discover(prov)
    df = (eng.table("orders")
          .filter(col("o_totalprice") < lit(-1))
          .select("o_orderkey", "o_totalprice").to_df())
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == \
        ["o_orderkey", "o_totalprice"]
    assert df.schema["o_orderkey"].dataType.typeName() != "string", \
        "typed empty result (schema-cast layer engaged over Flight)"
