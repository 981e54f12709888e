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


def test_insert_values(spark):
    """r13 (VERDICT r12 Next #7 review edge): INSERT ... VALUES — the
    most common INSERT shape — lowers to the same UNION-ALL-of-
    one-row-projections IR as a FROM-clause VALUES relation and ships
    as one remote statement; the paren-wrapped `(VALUES ...)` source
    and the column-list form work too; arity mismatches refuse."""
    from datafusion_federation_spark.sqlfront import (
        SqlParseError, parse_insert)
    eng, ex, prov = _duck_engine(spark, ["region"], name="wb_vals")
    ex.conn.execute("CREATE TABLE sink (x INT, lab VARCHAR)")
    eng.register_remote(prov, "sink")
    n = eng.sql("INSERT INTO sink VALUES (1, 'a'), (2, 'b')")
    assert n == 2
    n = eng.sql("INSERT INTO sink (x, lab) VALUES (3, 'c')")
    assert n == 1
    n = eng.sql("INSERT INTO sink (VALUES (4, 'd'))")
    assert n == 1
    assert ex.conn.execute(
        "SELECT * FROM sink ORDER BY x").fetchall() == [
            (1, "a"), (2, "b"), (3, "c"), (4, "d")]
    with pytest.raises(SqlParseError, match="arity"):
        parse_insert("INSERT INTO sink VALUES (1, 'a'), (2)",
                     eng.catalog.table)
    with pytest.raises(SqlParseError, match="names 2 columns"):
        parse_insert("INSERT INTO sink (x, lab) VALUES (1)",
                     eng.catalog.table)
    # UNION ALL of FROM-less SELECTs keeps working
    n = eng.sql("INSERT INTO sink SELECT 5 AS x, 'e' AS lab UNION ALL "
                "SELECT 6 AS x, 'f' AS lab")
    assert n == 2


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
    """Cross-provider subquery predicates and local targets refuse
    loudly (r13: SAME-provider subqueries now ship verbatim — see
    test_dml_same_provider_subqueries)."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_ref", compute_context="wb:ref")
    ex.conn.execute("CREATE TABLE t (k INT)")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    eng.register_local_parquet("region", f"{TESTDATA}/region.parquet")
    # subquery over a LOCAL table: would need Spark-side
    # materialization — refuses
    with pytest.raises(NotImplementedError, match="claim"):
        eng.sql("DELETE FROM t WHERE k IN "
                "(SELECT r_regionkey FROM region)")
    with pytest.raises(NotImplementedError, match="claim"):
        eng.sql("UPDATE t SET k = "
                "(SELECT MAX(r_regionkey) FROM region)")
    with pytest.raises(NotImplementedError, match="immutable"):
        eng.sql("DELETE FROM region")
    with pytest.raises(NotImplementedError, match="immutable"):
        eng.sql("UPDATE region SET r_name = 'x'")


def test_dml_same_provider_subqueries(spark):
    """r13 (VERDICT r12 Next #3): a DML predicate/value subquery that
    claims WHOLLY to the target's provider ships inside the one remote
    statement — verified by recomputing the expected survivors in
    DuckDB directly."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_sub", compute_context="wb:sub")
    ex.conn.execute("CREATE TABLE t (k INT, grp VARCHAR)")
    ex.conn.execute("INSERT INTO t VALUES (1,'a'),(2,'a'),(3,'b'),"
                    "(4,'b'),(5,'c')")
    ex.conn.execute("CREATE TABLE drops (k INT)")
    ex.conn.execute("INSERT INTO drops VALUES (2),(4)")
    eng = FederationEngine(spark)
    prov = SQLProvider(ex)
    eng.register_remote(prov, "t")
    eng.register_remote(prov, "drops")
    n = eng.sql("DELETE FROM t WHERE k IN (SELECT k FROM drops)")
    assert n == 2
    assert ex.conn.execute(
        "SELECT k FROM t ORDER BY k").fetchall() == [(1,), (3,), (5,)]
    # scalar subquery as an UPDATE value
    n = eng.sql("UPDATE t SET k = (SELECT MAX(k) FROM drops) "
                "WHERE grp = 'c'")
    assert n == 1
    assert ex.conn.execute(
        "SELECT k FROM t WHERE grp = 'c'").fetchall() == [(4,)]
    # EXISTS form in DELETE
    n = eng.sql("DELETE FROM t WHERE EXISTS "
                "(SELECT 1 FROM drops WHERE drops.k = 4)")
    assert n == 3


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
    """r13: params on DML now BIND (VERDICT r12 Next #2) — a param
    DELETE on a local parquet target reaches the immutability refusal;
    a column list on a LOCAL parquet target still refuses (appends are
    by-schema, not by-list)."""
    from datafusion_federation_spark.engine import FederationEngine
    eng = FederationEngine(spark)
    p = str(tmp_path / "t")
    spark.createDataFrame([("a", 1)], "r string, n int").write.parquet(p)
    eng.register_local_parquet("t", p)
    with pytest.raises(NotImplementedError, match="immutable"):
        eng.sql("DELETE FROM t WHERE n = :x", params={"x": 1})
    with pytest.raises(NotImplementedError, match="column"):
        eng.sql("INSERT INTO t (r) SELECT r FROM t")


def test_dml_param_binding(spark):
    """r13 (VERDICT r12 Next #2): $1/:name placeholders bind into
    DML — the literal reaches the remote statement through the
    existing expression unparse; unbound markers refuse loudly
    naming themselves; the oracle is a DuckDB recompute."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_par", compute_context="wb:par")
    ex.conn.execute("CREATE TABLE t (k INT, lab VARCHAR)")
    ex.conn.execute(
        "INSERT INTO t VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    n = eng.sql("DELETE FROM t WHERE k = :k", params={"k": 2})
    assert n == 1
    n = eng.sql("UPDATE t SET lab = :lab WHERE k > $1",
                params={"lab": "Z", "1": 3})
    assert n == 1
    n = eng.sql("INSERT INTO t VALUES (:k, :lab)",
                params={"k": 9, "lab": "ins"})
    assert n == 1
    n = eng.sql("INSERT INTO t SELECT k + :off AS k, lab FROM t "
                "WHERE k = :k", params={"off": 100, "k": 9})
    assert n == 1
    assert ex.conn.execute("SELECT k, lab FROM t ORDER BY k").fetchall() \
        == [(1, "a"), (3, "c"), (4, "Z"), (9, "ins"), (109, "ins")]
    with pytest.raises(ValueError, match=":missing"):
        eng.sql("DELETE FROM t WHERE k = :missing", params={"x": 1})
    with pytest.raises(ValueError, match=":k"):
        eng.sql("DELETE FROM t WHERE k = :k")
    # SELECT front door: params bind through the federated plan too
    got = [tuple(r) for r in eng.sql(
        "SELECT k, lab FROM t WHERE k >= :lo ORDER BY k",
        params={"lo": 9}).collect()]
    assert got == [(9, "ins"), (109, "ins")]
    with pytest.raises(ValueError, match=":lo"):
        eng.sql("SELECT k FROM t WHERE k >= :lo")


def test_dml_routing_block_comment_and_unregistered(spark):
    """r13 (VERDICT r12 What's-wrong #2 + ADVICE): a leading /* */
    block comment must not hide the DML verb from the router; DML on
    a table outside the federation catalog falls through to Spark's
    own resolution, which errors loudly naming the table instead of
    surfacing a bare KeyError."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_cmt", compute_context="wb:cmt")
    ex.conn.execute("CREATE TABLE t (k INT)")
    ex.conn.execute("INSERT INTO t VALUES (1),(2)")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    n = eng.sql("/* audit: cleanup */ DELETE FROM t WHERE k = 1")
    assert n == 1
    n = eng.sql("  -- line one\n/* and\nblock */ INSERT INTO t "
                "VALUES (7)")
    assert n == 1
    assert ex.conn.execute("SELECT k FROM t ORDER BY k").fetchall() \
        == [(2,), (7,)]
    # unregistered table: Spark names it (no bare KeyError escapes)
    with pytest.raises(Exception) as ei:
        eng.sql("DELETE FROM never_registered WHERE k = 1")
    assert not isinstance(ei.value, KeyError)
    assert "never_registered" in str(ei.value)


def test_update_qualified_set_columns(spark):
    """r13 (VERDICT r12 What's-wrong #3): UPDATE t SET t.col = ...
    accepts the target-table qualifier (single-table UPDATE makes it
    unambiguous); a qualifier naming some OTHER table refuses."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sqlfront import (
        SqlParseError, parse_update)
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_qs", compute_context="wb:qs")
    ex.conn.execute("CREATE TABLE t (k INT, lab VARCHAR)")
    ex.conn.execute("INSERT INTO t VALUES (1,'a'),(2,'b')")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    n = eng.sql("UPDATE t SET t.lab = 'Q' WHERE k = 2")
    assert n == 1
    assert ex.conn.execute(
        "SELECT lab FROM t WHERE k = 2").fetchall() == [("Q",)]
    with pytest.raises(SqlParseError, match="qualifier"):
        parse_update("UPDATE t SET other.lab = 'x'",
                     eng.catalog.table)


def test_ctas_paren_wrap_and_collision(spark):
    """r13 (ADVICE r12): `CREATE TABLE t AS (SELECT ...)` strips only
    a pair wrapping the WHOLE source (balance-scanned) and still runs
    remotely; a CTAS onto an already-registered name refuses up front
    instead of dying on the remote CREATE."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.federation import federate
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    eng, ex, prov = _duck_engine(spark, ["region"], name="wb_paren")
    n = eng.sql("CREATE TABLE wrapped AS (SELECT r_regionkey, r_name "
                "FROM region WHERE r_regionkey < 3)")
    assert n == 3
    assert ex.conn.execute(
        "SELECT COUNT(*) FROM wrapped").fetchall() == [(3,)]
    # full-wrap around a set-op inside ONE pair also lowers remotely
    n = eng.sql("CREATE TABLE wrapped2 AS (SELECT r_name FROM region "
                "UNION ALL SELECT r_name FROM region)")
    assert n == 10
    # name collision refuses up front, naming both outs
    with pytest.raises(ValueError, match="already registered"):
        eng.sql("CREATE TABLE wrapped AS SELECT r_name FROM region")


def test_derby_ctas_failure_drops_shell(spark):
    """r13 (ADVICE r12 + VERDICT r12 Next #5): Derby's two-statement
    CTAS is non-atomic — when the INSERT fails the engine drops the
    just-created empty shell so a retry does not trip over it."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        JDBCExecutor, SQLProvider)
    url = "jdbc:derby:memory:wbctasfail"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    try:
        st = conn.createStatement()
        st.executeUpdate('CREATE TABLE "src" ("k" INT)')
        st.executeUpdate('INSERT INTO "src" VALUES (1), (2)')
        st.close()
        ex = JDBCExecutor(url=url, name="wb_dcf", dialect="derby")
        eng = FederationEngine(spark)
        eng.register_remote(SQLProvider(ex), "src")
        orig = ex.execute_statement
        calls = []

        def failing(spark_, stmt):
            calls.append(stmt)
            if stmt.lstrip().upper().startswith("INSERT"):
                raise RuntimeError("injected INSERT failure")
            return orig(spark_, stmt)

        ex.execute_statement = failing
        with pytest.raises(RuntimeError, match="injected"):
            eng.sql("CREATE TABLE dst AS SELECT k FROM src")
        ex.execute_statement = orig
        # the shell was dropped: the same CTAS now succeeds
        assert any(s.lstrip().upper().startswith("DROP TABLE")
                   for s in calls)
        n = eng.sql("CREATE TABLE dst AS SELECT k FROM src")
        assert n == 2
    finally:
        try:
            jvm.java.sql.DriverManager.getConnection(url + ";drop=true")
        except Exception:
            pass


def test_explain_dml_staged_sql(spark):
    """r13: EXPLAIN on a DML statement returns the EXACT statement(s)
    that would ship to the remote engine — one 'plan' string row,
    Spark's EXPLAIN shape — without executing anything. EXPLAIN
    ANALYZE on DML refuses (it would execute the write)."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_ex", compute_context="wb:ex")
    ex.conn.execute("CREATE TABLE t (k INT, lab VARCHAR)")
    ex.conn.execute("INSERT INTO t VALUES (1,'a'),(2,'b')")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    before = ex.metrics().get("queries", 0)
    plan = eng.sql("EXPLAIN DELETE FROM t WHERE k = :k",
                   params={"k": 2}).collect()[0][0]
    assert plan == 'DELETE FROM "t" WHERE ("k" = 2)'
    plan = eng.sql("EXPLAIN UPDATE t SET lab = 'x' WHERE k = 1") \
        .collect()[0][0]
    assert plan == 'UPDATE "t" SET "lab" = \'x\' WHERE ("k" = 1)'
    plan = eng.sql("EXPLAIN INSERT INTO t SELECT k + 10 AS k, lab "
                   "FROM t").collect()[0][0]
    assert plan.startswith('INSERT INTO "t" ')
    plan = eng.sql("EXPLAIN CREATE TABLE t2 AS SELECT k FROM t") \
        .collect()[0][0]
    assert plan.startswith('CREATE TABLE "t2" AS ')
    # nothing executed, nothing mutated, nothing registered
    assert ex.metrics().get("queries", 0) == before
    assert ex.conn.execute("SELECT COUNT(*) FROM t").fetchone() == (2,)
    with pytest.raises(Exception):
        eng.catalog.table("t2")
    with pytest.raises(NotImplementedError, match="ANALYZE"):
        eng.sql("EXPLAIN ANALYZE DELETE FROM t")
    # non-DML EXPLAIN keeps the existing Spark fallback shape
    rows = eng.sql("EXPLAIN SELECT k FROM t").collect()
    assert len(rows) >= 1


def test_dml_unknown_table_error_is_typed(spark):
    """r13: only the typed UnknownTableError reroutes DML to the view
    fallback — a generic KeyError raised deeper surfaces as the bug
    it is."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.catalog import (
        UnknownTableError)
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_ut", compute_context="wb:ut")
    ex.conn.execute("CREATE TABLE t (k INT)")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "t")
    with pytest.raises(UnknownTableError, match="not registered"):
        eng.catalog.table("nope")
    # a deep KeyError must NOT silently reroute: break the executor
    ex2 = DuckDBExecutor(name="wb_ut2", compute_context="wb:ut2")
    ex2.conn.execute("CREATE TABLE u (k INT)")
    eng.register_remote(SQLProvider(ex2), "u")

    def boom(spark_, stmt):
        raise KeyError("internal bug")

    ex2.execute_statement = boom
    with pytest.raises(KeyError, match="internal bug"):
        eng.sql("DELETE FROM u WHERE k = 1")


def test_insert_scanless_source_vets_expression_subqueries(spark):
    """r13 self-review: a 'scanless' INSERT source (VALUES / FROM-less
    SELECT) can hide scans inside EXPRESSION subqueries. Before the
    fix, `INSERT INTO <remote> VALUES ((SELECT COUNT(*) FROM docs))`
    with `docs` registered LOCALLY shipped `(SELECT COUNT(*) FROM
    "docs")` verbatim to the remote engine — silently reading the
    remote's SAME-NAMED table instead of the registered one. Now:
    same-provider subqueries splice their claimed SQL, literal-only
    subqueries ship (they read nothing anywhere), and local/
    cross-provider subqueries refuse."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    ex = DuckDBExecutor(name="wb_sv", compute_context="wb:sv")
    ex.conn.execute("CREATE TABLE sink (n BIGINT)")
    # the remote has its OWN 'docs' with 7 rows; the registered local
    # 'docs' has 2 — shipping the name verbatim would read the wrong one
    ex.conn.execute(
        "CREATE TABLE docs AS SELECT unnest(range(7)) AS k")
    ex._tables["docs"] = "docs"
    eng = FederationEngine(spark)
    prov = SQLProvider(ex)
    eng.register_remote(prov, "sink")
    eng.register_local_df("docs", spark.createDataFrame(
        [(1,), (2,)], "k bigint"))
    with pytest.raises(NotImplementedError, match="claim"):
        eng.sql("INSERT INTO sink VALUES ((SELECT COUNT(*) FROM docs))")
    with pytest.raises(NotImplementedError, match="claim"):
        eng.sql("INSERT INTO sink SELECT (SELECT COUNT(*) FROM docs) "
                "AS n")
    assert ex.conn.execute("SELECT COUNT(*) FROM sink").fetchone() \
        == (0,)
    # literal-only subqueries read nothing anywhere: they ship
    assert eng.sql("INSERT INTO sink VALUES ((SELECT 41 + 1))") == 1
    # same-provider subqueries splice their claimed SQL and read the
    # REMOTE docs (the engine that owns the statement)
    eng2 = FederationEngine(spark)
    eng2.register_remote(prov, "sink")
    eng2.register_remote(prov, "docs")
    assert eng2.sql("INSERT INTO sink VALUES "
                    "((SELECT COUNT(*) FROM docs))") == 1
    assert ex.conn.execute(
        "SELECT n FROM sink ORDER BY n").fetchall() == [(7,), (42,)]
    # DELETE/UPDATE literal subqueries ship too (previously refused)
    ex.conn.execute("CREATE TABLE dl (k INT)")
    ex.conn.execute("INSERT INTO dl VALUES (1),(5)")
    eng2.register_remote(prov, "dl")
    assert eng2.sql("DELETE FROM dl WHERE k = (SELECT 2 + 3)") == 1
