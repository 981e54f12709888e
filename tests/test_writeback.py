"""Federated write-back (r12, VERDICT r11 Next #6): the
``INSERT INTO <remote> SELECT ...`` front door executes the whole
statement REMOTELY when the source fully claims to the target's
provider — one round trip, no data through Spark — and refuses
cross-provider writes loudly (reference only delegates insert_into to
a fallback provider, src/table_provider.rs:126-139)."""

import os

import duckdb
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TEST_SF",
                          "/root/testdata/sf0.001")


def _duck_engine(spark, tables, name="wb_duck"):
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name=name, compute_context=f"wb:{name}")
    for t in tables:
        ex.register_parquet(t, f"{TESTDATA}/{t}.parquet")
    eng = FederationEngine(spark)
    prov = SQLProvider(ex)
    for t in tables:
        eng.register_remote(prov, t)
    return eng, ex, prov


def test_remote_insert_select_executes_remotely(spark):
    """Happy path: INSERT INTO remote SELECT <same-provider source>
    ships ONE DML statement; values verified by read-back against a
    direct DuckDB recomputation, and no federated read of the source
    ever returns to Spark."""
    eng, ex, prov = _duck_engine(spark, ["region", "nation"])
    ex.conn.execute("CREATE TABLE region_stats "
                    "(r_name VARCHAR, n_nations BIGINT)")
    eng.register_remote(prov, "region_stats")
    before = ex.metrics().get("queries", 0)
    n = eng.sql(
        "INSERT INTO region_stats "
        "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations "
        "FROM region JOIN nation ON n_regionkey = r_regionkey "
        "GROUP BY r_name")
    assert n == 5
    # exactly one executor interaction: the DML statement itself
    assert ex.metrics().get("queries", 0) == before + 1
    assert ex.metrics()["last_sql"].lstrip().upper() \
        .startswith("INSERT INTO")
    got = [tuple(r) for r in eng.sql(
        "SELECT r_name, n_nations FROM region_stats "
        "ORDER BY r_name").collect()]
    con = duckdb.connect()
    want = con.execute(
        f"SELECT r_name, CAST(COUNT(*) AS BIGINT) FROM "
        f"read_parquet('{TESTDATA}/region.parquet') r JOIN "
        f"read_parquet('{TESTDATA}/nation.parquet') n "
        f"ON n_regionkey = r_regionkey GROUP BY r_name "
        f"ORDER BY r_name").fetchall()
    assert got == want


def test_remote_insert_column_list(spark):
    """An explicit column list renders quoted in the remote dialect;
    unnamed columns fill with NULL/defaults per the engine."""
    eng, ex, prov = _duck_engine(spark, ["region"], name="wb_cols")
    ex.conn.execute("CREATE TABLE rnames "
                    "(r_name VARCHAR, note VARCHAR DEFAULT 'x')")
    eng.register_remote(prov, "rnames")
    n = eng.sql("INSERT INTO rnames (r_name) "
                "SELECT r_name FROM region")
    assert n == 5
    rows = ex.conn.execute(
        "SELECT r_name, note FROM rnames ORDER BY r_name").fetchall()
    assert len(rows) == 5 and all(r[1] == 'x' for r in rows)


def test_cross_provider_insert_refuses(spark):
    """A source that does not fully claim to the target's provider
    must refuse — not silently materialize through the driver."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    eng = FederationEngine(spark)
    ex_a = DuckDBExecutor(name="wb_a", compute_context="wb:a")
    ex_a.register_parquet("region", f"{TESTDATA}/region.parquet")
    ex_a.conn.execute("CREATE TABLE sink (r_name VARCHAR)")
    eng.register_remote(SQLProvider(ex_a), "sink")
    # source lives LOCALLY -> cannot claim to provider a
    eng.register_local_parquet("region", f"{TESTDATA}/region.parquet")
    with pytest.raises(NotImplementedError, match="cross-provider"):
        eng.sql("INSERT INTO sink SELECT r_name FROM region")
    # and a second remote engine is equally refused
    ex_b = DuckDBExecutor(name="wb_b", compute_context="wb:b")
    ex_b.register_parquet("nation", f"{TESTDATA}/nation.parquet")
    eng.register_remote(SQLProvider(ex_b), "nation")
    with pytest.raises(NotImplementedError, match="cross-provider"):
        eng.sql("INSERT INTO sink SELECT n_name FROM nation")


def test_local_target_insert_select(spark, tmp_path):
    """A LOCAL parquet target computes the source and appends through
    the existing passthrough (the reference's fallback delegation)."""
    from datafusion_federation_spark.engine import FederationEngine
    eng = FederationEngine(spark)
    p = str(tmp_path / "sink_parquet")
    spark.createDataFrame([("seed",)], "r_name string") \
        .write.parquet(p)
    eng.register_local_parquet("sink", p)
    eng.register_local_parquet("region", f"{TESTDATA}/region.parquet")
    eng.sql("INSERT INTO sink SELECT r_name FROM region")
    assert spark.read.parquet(p).count() == 6   # 1 seed + 5 regions


def test_insert_values_refuses(spark):
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sqlfront import (
        SqlParseError, parse_insert)
    eng, ex, prov = _duck_engine(spark, ["region"], name="wb_vals")
    ex.conn.execute("CREATE TABLE sink (x INT)")
    eng.register_remote(prov, "sink")
    with pytest.raises(SqlParseError, match="VALUES"):
        parse_insert("INSERT INTO sink VALUES (1)", eng.catalog.table)
    # UNION ALL of FROM-less SELECTs is the supported spelling
    n = eng.sql("INSERT INTO sink SELECT 1 AS x UNION ALL "
                "SELECT 2 AS x")
    assert n == 2
    assert ex.conn.execute(
        "SELECT * FROM sink ORDER BY x").fetchall() == [(1,), (2,)]


def test_derby_remote_writeback(spark):
    """Live Derby (JDBC): the whole INSERT ... SELECT runs inside the
    remote JVM engine via DriverManager executeUpdate."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        JDBCExecutor, SQLProvider)
    url = "jdbc:derby:memory:wbderby"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    try:
        st = conn.createStatement()
        st.executeUpdate('CREATE TABLE "src" ("k" INT, "v" INT)')
        st.executeUpdate('INSERT INTO "src" VALUES (1, 10), (2, 20), '
                         '(3, 30)')
        st.executeUpdate('CREATE TABLE "sink" ("k" INT, "tot" INT)')
        st.close()
        ex = JDBCExecutor(url=url, name="wb_derby", dialect="derby")
        eng = FederationEngine(spark)
        prov = SQLProvider(ex)
        eng.register_remote(prov, "src")
        eng.register_remote(prov, "sink")
        n = eng.sql('INSERT INTO sink SELECT k, k * v AS tot FROM src')
        assert n == 3
        got = [tuple(r) for r in eng.sql(
            "SELECT k, tot FROM sink ORDER BY k").collect()]
        assert got == [(1, 10), (2, 40), (3, 90)]
    finally:
        try:
            jvm.java.sql.DriverManager.getConnection(url + ";drop=true")
        except Exception:
            pass


def test_remote_delete_and_update(spark):
    """DELETE/UPDATE front doors: predicate + assignments unparse to
    the target dialect, one remote statement each, verified by direct
    reads of the remote engine."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_dml", compute_context="wb:dml")
    ex.conn.execute("CREATE TABLE t (k INT, lang VARCHAR, n INT)")
    ex.conn.execute("INSERT INTO t VALUES (1,'en',5),(2,'de',7),"
                    "(3,'en',9),(4,'fr',11)")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    assert eng.sql("DELETE FROM t WHERE n < 7 AND lang = 'en'") == 1
    assert eng.sql("UPDATE t SET n = n * 10, lang = upper(lang) "
                   "WHERE k >= 3") == 2
    assert ex.conn.execute("SELECT * FROM t ORDER BY k").fetchall() \
        == [(2, 'de', 7), (3, 'EN', 90), (4, 'FR', 110)]
    # bare DELETE (no WHERE) empties the table
    assert eng.sql("DELETE FROM t") == 3
    assert ex.conn.execute("SELECT COUNT(*) FROM t").fetchone()[0] == 0


def test_dml_refusals(spark):
    """Subquery predicates and local targets refuse loudly."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_ref", compute_context="wb:ref")
    ex.conn.execute("CREATE TABLE t (k INT)")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    eng.register_local_parquet("region", f"{TESTDATA}/region.parquet")
    with pytest.raises(NotImplementedError, match="subquery"):
        eng.sql("DELETE FROM t WHERE k IN (SELECT k FROM t)")
    with pytest.raises(NotImplementedError, match="subquery"):
        eng.sql("UPDATE t SET k = (SELECT MAX(k) FROM t)")
    with pytest.raises(NotImplementedError, match="immutable"):
        eng.sql("DELETE FROM region")
    with pytest.raises(NotImplementedError, match="immutable"):
        eng.sql("UPDATE region SET r_name = 'x'")


def test_remote_ctas(spark):
    """CREATE TABLE AS over a fully-claimed source executes on the
    remote engine and the new table registers locally (immediately
    federable)."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    eng, ex, prov = _duck_engine(spark, ["region", "nation"],
                                 name="wb_ctas")
    n = eng.sql("CREATE TABLE region_sizes AS "
                "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations "
                "FROM region JOIN nation "
                "ON n_regionkey = r_regionkey GROUP BY r_name")
    assert n == 5
    # registered: immediately queryable through federation
    got = [tuple(r) for r in eng.sql(
        "SELECT r_name, n_nations FROM region_sizes "
        "ORDER BY r_name").collect()]
    assert len(got) == 5 and all(v == 5 for _, v in got)
    # OR REPLACE is a DuckDB spelling and works end-to-end
    assert eng.sql("CREATE OR REPLACE TABLE region_sizes AS "
                   "SELECT r_name FROM region WHERE r_regionkey < 2"
                   ) == 2
    # unclaimed (local) source refuses
    eng.register_local_parquet("part", f"{TESTDATA}/part.parquet")
    with pytest.raises(NotImplementedError, match="claim"):
        eng.sql("CREATE TABLE p2 AS SELECT p_name FROM part")


def test_derby_ctas_two_statement(spark):
    """Derby has no CTAS-with-data: the engine runs CREATE ... WITH
    NO DATA + INSERT, still entirely remote."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        JDBCExecutor, SQLProvider)
    url = "jdbc:derby:memory:wbctas"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    try:
        st = conn.createStatement()
        st.executeUpdate('CREATE TABLE "src" ("k" INT)')
        st.executeUpdate('INSERT INTO "src" VALUES (1), (2), (3)')
        st.close()
        ex = JDBCExecutor(url=url, name="wb_dctas", dialect="derby")
        eng = FederationEngine(spark)
        eng.register_remote(SQLProvider(ex), "src")
        n = eng.sql('CREATE TABLE dst AS SELECT k FROM src '
                    'WHERE k > 1')
        assert n == 2
        got = sorted(r[0] for r in eng.sql(
            "SELECT k FROM dst").collect())
        assert got == [2, 3]
        # OR REPLACE refuses by dialect gate
        with pytest.raises(NotImplementedError, match="OR REPLACE"):
            eng.sql("CREATE OR REPLACE TABLE dst AS "
                    "SELECT k FROM src")
    finally:
        try:
            jvm.java.sql.DriverManager.getConnection(url + ";drop=true")
        except Exception:
            pass


def test_insert_paren_and_cte_sources(spark):
    """r12 review: CTE sources and whole-wrap parenthesized sources
    parse and ship; ORDER BY in the source is preserved harmlessly."""
    eng, ex, prov = _duck_engine(spark, ["region"], name="wb_src")
    ex.conn.execute("CREATE TABLE sink (r VARCHAR, n BIGINT)")
    eng.register_remote(prov, "sink")
    assert eng.sql(
        "INSERT INTO sink WITH f AS (SELECT r_name FROM region) "
        "SELECT r_name AS r, CAST(COUNT(*) AS BIGINT) AS n FROM f "
        "GROUP BY r_name") == 5
    assert eng.sql(
        "INSERT INTO sink (SELECT r_name AS r, CAST(1 AS BIGINT) "
        "AS n FROM region)") == 5
    assert eng.sql(
        "INSERT INTO sink SELECT r_name AS r, CAST(2 AS BIGINT) AS n "
        "FROM region ORDER BY r_name") == 5
    assert ex.conn.execute(
        "SELECT COUNT(*) FROM sink").fetchone()[0] == 15


def test_spark_remote_writeback(spark, tmp_path):
    """Spark-to-Spark write-back: the remote SparkSession runs the
    whole INSERT ... SELECT itself (its catalog table is a saved
    parquet table, not a temp view)."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        SparkSQLExecutor, SQLProvider)
    remote = spark.newSession()
    wh = str(tmp_path / "sink_tbl")
    remote.read.parquet(f"{TESTDATA}/region.parquet") \
        .createOrReplaceTempView("region_r")
    remote.createDataFrame([], "r_name string, n bigint") \
        .write.option("path", wh).saveAsTable("wb_sink")
    try:
        ex = SparkSQLExecutor(remote, name="spark_wb")
        eng = FederationEngine(spark)
        prov = SQLProvider(ex)
        eng.register_remote(prov, "region_r")
        eng.register_remote(prov, "wb_sink")
        n = eng.sql("INSERT INTO wb_sink SELECT r_name, "
                    "CAST(r_regionkey AS BIGINT) AS n FROM region_r")
        assert n is None    # Spark reports no affected count
        got = sorted(tuple(r) for r in eng.sql(
            "SELECT r_name, n FROM wb_sink").collect())
        assert len(got) == 5 and all(isinstance(v, int)
                                     for _, v in got)
    finally:
        remote.sql("DROP TABLE IF EXISTS wb_sink")


def test_dml_params_and_local_collist_refuse(spark, tmp_path):
    """r12 review: bound params on DML refuse (silently dropping them
    would mutate unselected rows); a column list on a LOCAL parquet
    target refuses (appends are by-schema, not by-list)."""
    from datafusion_federation_spark.engine import FederationEngine
    eng = FederationEngine(spark)
    p = str(tmp_path / "t")
    spark.createDataFrame([("a", 1)], "r string, n int").write.parquet(p)
    eng.register_local_parquet("t", p)
    with pytest.raises(NotImplementedError, match="params"):
        eng.sql("DELETE FROM t WHERE n = :x", params={"x": 1})
    with pytest.raises(NotImplementedError, match="column"):
        eng.sql("INSERT INTO t (r) SELECT r FROM t")
