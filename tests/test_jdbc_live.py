"""LIVE JDBC federation — a real DriverManager round-trip, not a fake
transport (complements tests/test_jdbc_discovery.py, which pins the
discovery protocol against a mock).

Target engine: Apache Derby, the pure-Java embedded database Spark
already ships for its Hive metastore — on the classpath of every Spark
distribution, so the test needs zero extra jars and runs anywhere the
suite runs. Tables/columns are created as QUOTED lowercase identifiers
(Derby folds unquoted names to uppercase; quoting keeps the remote SQL
our unparser emits — which quotes every identifier — exactly matching).

Covers: federated collapse to one remote SQL over JDBC, Derby dialect
rendering (FETCH FIRST, no LIMIT), information-schema-less catalog
discovery (SYS tables), schema probing, and the INSERT passthrough.
"""

from __future__ import annotations

import pytest

from datafusion_federation_spark.expressions import agg, col, lit
from datafusion_federation_spark.federation import federate
from datafusion_federation_spark.plans.nodes import (
    RemoteQueryNode, walk_plan,
)
from datafusion_federation_spark.sources.provider import (
    JDBCExecutor, SQLProvider,
)

_URL = "jdbc:derby:memory:fedlive"


@pytest.fixture(scope="module")
def derby(spark):
    """An in-memory Derby database with two small quoted-lowercase
    tables, plus the engine federating them."""
    from datafusion_federation_spark.engine import FederationEngine

    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(_URL + ";create=true")
    st = conn.createStatement()
    for ddl in (
        '''CREATE TABLE "fed_orders" ("okey" INT, "cust" INT,
           "total" DOUBLE, "prio" VARCHAR(20))''',
        '''CREATE TABLE "fed_dim" ("prio" VARCHAR(20), "weight" INT)''',
        '''CREATE TABLE "fed_sink" ("k" INT, "v" DOUBLE)''',
    ):
        st.executeUpdate(ddl)
    st.executeUpdate(
        '''INSERT INTO "fed_orders" VALUES
           (1, 10, 150.0, '1-URGENT'), (2, 11, 50.0, '5-LOW'),
           (3, 10, 200.0, '1-URGENT'), (4, 12, 75.0, '2-HIGH'),
           (5, 11, 30.0, '5-LOW')''')
    st.executeUpdate(
        '''INSERT INTO "fed_dim" VALUES
           ('1-URGENT', 5), ('2-HIGH', 4), ('5-LOW', 1)''')
    conn.commit()

    ex = JDBCExecutor(url=_URL, name="derbyeng", dialect="derby")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "fed_orders")
    eng.register_remote(SQLProvider(ex), "fed_dim")
    yield eng, ex
    try:
        jvm.java.sql.DriverManager.getConnection(_URL + ";drop=true")
    except Exception:  # noqa: BLE001 - drop always throws SQLException 08006
        pass


def test_derby_single_remote_collapse_and_values(derby):
    """Same-provider join+agg collapses to ONE remote SQL executed by
    Derby over JDBC; values verified against hand-computed truth."""
    eng, ex = derby
    b = (eng.table("fed_orders")
         .filter(col("total") > lit(40.0))
         .join(eng.table("fed_dim"), on=col("fed_orders.prio")
               == col("fed_dim.prio"))
         .group_by("weight")
         .agg(agg("count").alias("n"),
              agg("sum", col("total")).alias("tot")))
    fed = federate(b.plan)
    remotes = [n for n in walk_plan(fed) if isinstance(n, RemoteQueryNode)]
    assert len(remotes) == 1, "same-provider subtree must fully collapse"
    assert remotes[0].provider.name == "derbyeng"
    rows = {r["weight"]: (r["n"], r["tot"]) for r in b.to_df().collect()}
    # rows > 40.0: okey 1,2,3,4 (not 5); URGENT w=5: n=2 tot=350;
    # HIGH w=4: n=1 tot=75; LOW w=1: n=1 tot=50
    assert rows == {5: (2, 350.0), 4: (1, 75.0), 1: (1, 50.0)}


def test_derby_fetch_first_limit_shape(derby):
    """Derby has no LIMIT keyword: the shipped SQL must use the
    standard OFFSET/FETCH FIRST forms."""
    eng, ex = derby
    b = (eng.table("fed_orders")
         .select("okey", "total")
         .order_by("okey")
         .limit(2, offset=1))
    fed = federate(b.plan)
    remotes = [n for n in walk_plan(fed) if isinstance(n, RemoteQueryNode)]
    assert len(remotes) == 1
    sql = remotes[0].sql
    assert "FETCH FIRST 2 ROWS ONLY" in sql and "OFFSET 1 ROWS" in sql
    assert "LIMIT" not in sql
    assert [r["okey"] for r in b.to_df().collect()] == [2, 3]


def test_derby_catalog_discovery(derby):
    """table_names() walks Derby's SYS catalog (no information_schema)
    through the same JDBC query path as any federated query."""
    eng, ex = derby
    names = ex.table_names()
    assert "APP.fed_orders" in names
    assert "APP.fed_dim" in names


def test_derby_schema_probe(derby):
    eng, ex = derby
    schema = ex.get_table_schema(
        eng.spark if hasattr(eng, "spark") else
        __import__("pyspark.sql", fromlist=["SparkSession"])
        .SparkSession.getActiveSession(),
        "fed_orders")
    assert [f.name for f in schema.fields] == \
        ["okey", "cust", "total", "prio"]


def test_derby_insert_passthrough(derby, spark):
    """INSERT passthrough: a Spark DataFrame lands in the remote Derby
    table via the distributed JDBC writer and reads back federated."""
    eng, ex = derby
    df = spark.createDataFrame([(1, 1.5), (2, 2.5)], '`k` int, `v` double')
    ex.insert(spark, df, '"fed_sink"')
    # quoted aliases: Derby folds unquoted identifiers to uppercase
    back = ex.execute(
        spark, 'SELECT COUNT(*) AS "n", SUM("v") AS "s" FROM "fed_sink"',
        partitioned=False).collect()[0]
    assert (back["n"], back["s"]) == (2, 4.0)


def test_q76_registered_query_collapses_to_one_derby_sql(spark):
    """The driver-recorded q76 (live Derby federation) must ship ONE
    remote SQL through the JDBC executor — pin the shape so a planner
    regression can't silently turn it into N per-table fetches."""
    from datafusion_federation_spark.queries import REGISTRY
    import datafusion_federation_spark.queries_pipeline  # noqa: F401

    fn, oracle = REGISTRY["q76_derby_federated"]
    assert oracle is not None
    df = fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 5 and rows[0].n_nations >= 1
    # the collapsed plan reaches Spark as a single JDBC scan: no Join
    # in the executed plan (Derby ran it), one JDBCRelation
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan, plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
