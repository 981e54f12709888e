"""Unparser golden tests — port of the reference's analyzer goldens
(/root/reference/datafusion-federation/src/sql/analyzer.rs:753-1028) plus
goldens for the dialect-safety rewrites (HAVING-by-alias, semi/anti joins,
scoped set-op branches).

Spelling notes vs the reference goldens: our unparser quotes every
identifier, and instead of textually rewriting column qualifiers to the
remote table name (RewriteTableScanAnalyzer), handles carry remote refs
from registration and a scan whose remote name differs from its local name
is aliased AS the local name — semantically identical SQL. Each golden that
should run on DuckDB is additionally executed there (test_goldens_execute)
so the strings are proven valid, not just pinned.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_federation_spark.expressions import (
    Alias, BinaryOp, Col, Lit, SortKey, Star, agg, col, lit,
)
from datafusion_federation_spark.plans.nodes import (
    Aggregate, Distinct, Filter, Join, Limit, Project, Scan, SetOp, Sort,
    SubqueryAlias, Union,
)
from datafusion_federation_spark.sources.table import RemoteTable, TableHandle
from datafusion_federation_spark.unparser import Unparser


def h(local: str, remote: str | None = None) -> TableHandle:
    """Registry handle; remote defaults to the local name (the common
    same-name case of the reference goldens)."""
    return TableHandle(local_name=local, provider=None,
                       remote=RemoteTable.named(remote or local))


def sql(plan, dialect="ansi") -> str:
    return Unparser(dialect).plan_to_sql(plan)


def scan(local="remote_table", remote=None) -> Scan:
    return Scan(h(local, remote))


# ---------------------------------------------------------------------------
# projection & basic aggregates (analyzer.rs:753-804)
# ---------------------------------------------------------------------------

def test_project_three_columns():
    # analyzer.rs:715-738 (scan().project().build() golden)
    p = Project(scan(), [col("a"), col("b"), col("c")])
    assert sql(p) == 'SELECT "a", "b", "c" FROM "remote_table"'


def test_rewrite_local_to_remote_name():
    # the RewriteTableScanAnalyzer analog: local df_table -> remote_table
    p = Project(scan("df_table", "remote_table"),
                [Col("a", "df_table"), Col("b", "df_table")])
    assert sql(p) == ('SELECT "df_table"."a", "df_table"."b" '
                      'FROM "remote_table" AS "df_table"')


@pytest.mark.parametrize("fn,expect", [
    ("max", 'SELECT MAX("a") FROM "remote_table"'),
    ("min", 'SELECT MIN("a") FROM "remote_table"'),
    ("avg", 'SELECT AVG("a") FROM "remote_table"'),
    ("sum", 'SELECT SUM("a") FROM "remote_table"'),
    ("count", 'SELECT COUNT("a") FROM "remote_table"'),
])
def test_ungrouped_aggregates(fn, expect):
    # analyzer.rs:755-780
    p = Aggregate(scan(), [], [agg(fn, col("a"))])
    assert sql(p) == expect


def test_aggregate_alias_preserved():
    # "SELECT COUNT(a) as cnt" golden (analyzer.rs:781-787)
    p = Aggregate(scan(), [], [Alias(agg("count", col("a")), "cnt")])
    assert sql(p) == 'SELECT COUNT("a") AS "cnt" FROM "remote_table"'


def test_case_inside_aggregate():
    # COUNT(CASE WHEN a > 0 THEN a ELSE 0 END) golden (analyzer.rs:797-800)
    from datafusion_federation_spark.expressions import Case
    case = Case([(BinaryOp(">", col("a"), lit(0)), col("a"))], lit(0))
    p = Aggregate(scan(), [], [agg("count", case)])
    assert sql(p) == ('SELECT COUNT(CASE WHEN ("a" > 0) THEN "a" ELSE 0 END) '
                      'FROM "remote_table"')


# ---------------------------------------------------------------------------
# derived tables & alias scoping (analyzer.rs:786-792, 813-865)
# ---------------------------------------------------------------------------

def test_subquery_alias_scoping():
    # SELECT b.app_table FROM (SELECT a AS app_table FROM t) AS b
    inner = Project(scan("app_table", "remote_table"),
                    [Alias(col("a"), "app_table")])
    p = Project(SubqueryAlias(inner, "b"), [Col("app_table", "b")])
    assert sql(p) == ('SELECT "b"."app_table" FROM (SELECT "a" AS '
                      '"app_table" FROM "remote_table" AS "app_table") AS "b"')


def test_max_over_derived_table():
    # SELECT max(b.app_table) FROM (...) AS b (analyzer.rs:790-792)
    inner = Project(scan("app_table", "remote_table"),
                    [Alias(col("a"), "app_table")])
    p = Aggregate(SubqueryAlias(inner, "b"), [],
                  [agg("max", Col("app_table", "b"))])
    assert sql(p) == ('SELECT MAX("b"."app_table") FROM (SELECT "a" AS '
                      '"app_table" FROM "remote_table" AS "app_table") AS "b"')


def test_preserve_existing_alias():
    # SELECT b.a AS app_table_a FROM app_table AS b (analyzer.rs:846-864)
    p = Project(SubqueryAlias(scan("app_table", "remote_table"), "b"),
                [Alias(Col("a", "b"), "app_table_a")])
    assert sql(p) == ('SELECT "b"."a" AS "app_table_a" FROM "remote_table" '
                      'AS "b"')


# ---------------------------------------------------------------------------
# LIMIT / OFFSET incl. zeros (analyzer.rs:890-938, CHANGELOG #101)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fetch,skip,tail", [
    (5, None, "LIMIT 5"),
    (None, 5, "OFFSET 5"),
    (10, 5, "LIMIT 10 OFFSET 5"),
    (None, 0, "OFFSET 0"),
    (0, None, "LIMIT 0"),
    (0, 0, "LIMIT 0 OFFSET 0"),
])
def test_limit_offset_forms(fetch, skip, tail):
    p = Limit(Project(scan(), [col("a")]), fetch=fetch, skip=skip)
    assert sql(p) == f'SELECT "a" FROM "remote_table" {tail}'


def test_mysql_offset_needs_limit():
    p = Limit(Project(scan(), [col("a")]), fetch=None, skip=5)
    assert sql(p, "mysql") == ("SELECT `a` FROM `remote_table` "
                               "LIMIT 18446744073709551615 OFFSET 5")


# ---------------------------------------------------------------------------
# multipart remote names (analyzer.rs:975-1028)
# ---------------------------------------------------------------------------

def test_multipart_remote_table():
    p = Aggregate(scan("df_table", "default.remote_table"), [],
                  [agg("max", col("a"))])
    assert sql(p) == ('SELECT MAX("a") FROM "default"."remote_table" '
                      'AS "df_table"')


def test_multipart_derived_table():
    inner = Project(scan("app_table", "default.remote_table"),
                    [Alias(col("a"), "app_table_a")])
    p = Project(inner, [col("app_table_a")])
    # unlike the reference golden, the derived table always gets an alias
    # (PostgreSQL requires one; DuckDB/ANSI accept it)
    assert sql(p) == ('SELECT "app_table_a" FROM (SELECT "a" AS '
                      '"app_table_a" FROM "default"."remote_table" '
                      'AS "app_table") AS "__q1"')


# ---------------------------------------------------------------------------
# parameterized views (mod.rs:670 golden: FROM table_b1(1) AS table_b1)
# ---------------------------------------------------------------------------

def test_parameterized_view_gets_alias():
    p = Project(scan("table_b1", "table_b1(1)"), [col("a")])
    assert sql(p) == 'SELECT "a" FROM "table_b1"(1) AS "table_b1"'


def test_parameterized_view_named_args():
    p = Project(scan("v", "schema.view(name => 'obj')"), [col("a")])
    assert sql(p) == ('SELECT "a" FROM "schema"."view"(name => \'obj\') '
                      'AS "v"')


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def test_cross_join_aliases():
    # FROM remote_table AS appt CROSS JOIN remote_table AS dft
    # (analyzer.rs:800-803)
    l = SubqueryAlias(scan("app_table", "remote_table"), "appt")
    r = SubqueryAlias(scan("df_table", "remote_table"), "dft")
    p = Aggregate(Join(l, r, how="cross"), [], [agg("count", Star())])
    assert sql(p) == ('SELECT COUNT(*) FROM "remote_table" AS "appt" '
                      'CROSS JOIN "remote_table" AS "dft"')


def test_inner_join_on():
    l, r = scan("t"), scan("a")
    p = Project(Join(l, r, condition=BinaryOp("=", Col("foo", "t"), Col("foo", "a"))),
                [Col("foo", "t")])
    assert sql(p) == ('SELECT "t"."foo" FROM "t" JOIN "a" '
                      'ON ("t"."foo" = "a"."foo")')


def test_semi_join_exists_fallback_ansi():
    # ANSI/Postgres have no SEMI JOIN: the unparser must emit EXISTS
    l, r = scan("orders"), scan("customer")
    cond = BinaryOp("=", Col("o_custkey", "orders"), Col("c_custkey", "customer"))
    p = Project(Join(l, r, how="semi", condition=cond),
                [Col("o_orderkey", "orders")])
    assert sql(p, "postgres") == (
        'SELECT "orders"."o_orderkey" FROM "orders" WHERE EXISTS '
        '(SELECT 1 FROM "customer" WHERE '
        '("orders"."o_custkey" = "customer"."c_custkey"))')


def test_anti_join_not_exists_fallback_ansi():
    l, r = scan("orders"), scan("customer")
    cond = BinaryOp("=", Col("o_custkey", "orders"), Col("c_custkey", "customer"))
    p = Project(Join(l, r, how="anti", condition=cond),
                [Col("o_orderkey", "orders")])
    out = sql(p, "ansi")
    assert "NOT EXISTS (SELECT 1 FROM" in out


def test_semi_join_native_duckdb():
    l, r = scan("orders"), scan("customer")
    cond = BinaryOp("=", Col("o_custkey", "orders"), Col("c_custkey", "customer"))
    p = Project(Join(l, r, how="semi", condition=cond),
                [Col("o_orderkey", "orders")])
    assert sql(p, "duckdb") == (
        'SELECT "orders"."o_orderkey" FROM "orders" SEMI JOIN "customer" '
        'ON ("orders"."o_custkey" = "customer"."c_custkey")')


# ---------------------------------------------------------------------------
# filter above aggregate: derived table + WHERE, never HAVING-by-alias
# ---------------------------------------------------------------------------

def test_filter_above_aggregate_is_where_on_derived_table():
    ag = Aggregate(scan(), [col("b")],
                   [Alias(agg("sum", col("a")), "total")])
    p = Filter(ag, BinaryOp(">", col("total"), lit(100)))
    out = sql(p)
    assert "HAVING" not in out
    assert out == ('SELECT * FROM (SELECT "b", SUM("a") AS "total" FROM '
                   '"remote_table" GROUP BY "b") AS "__q1" '
                   'WHERE ("total" > 100)')


def test_aggregate_having_renders_raw_aggregate():
    # Aggregate.having holds the raw aggregate expr -> ANSI-legal HAVING
    ag = Aggregate(scan(), [col("b")],
                   [Alias(agg("sum", col("a")), "total")],
                   having=BinaryOp(">", agg("sum", col("a")), lit(100)))
    assert sql(ag) == ('SELECT "b", SUM("a") AS "total" FROM "remote_table" '
                       'GROUP BY "b" HAVING (SUM("a") > 100)')


# ---------------------------------------------------------------------------
# set operations (mod.rs:608-679: multi-branch UNION ALL as one query)
# ---------------------------------------------------------------------------

def test_union_all_three_branches():
    b = [Project(scan(f"t{i}"), [col("a")]) for i in range(3)]
    p = Union(b, all=True)
    assert sql(p) == ('SELECT "a" FROM "t0" UNION ALL SELECT "a" FROM "t1" '
                      'UNION ALL SELECT "a" FROM "t2"')


def test_union_branch_with_own_limit_is_scoped():
    # a branch LIMIT must not leak to the whole union
    b1 = Limit(Project(scan("t0"), [col("a")]), fetch=5)
    b2 = Project(scan("t1"), [col("a")])
    out = sql(Union([b1, b2], all=True))
    assert out == ('SELECT * FROM (SELECT "a" FROM "t0" LIMIT 5) AS "__q1" '
                   'UNION ALL SELECT "a" FROM "t1"')


def test_order_limit_above_union_binds_globally():
    b = [Project(scan(f"t{i}"), [col("a")]) for i in range(2)]
    p = Limit(Sort(Union(b, all=True), [SortKey(col("a"))]), fetch=3)
    assert sql(p) == ('SELECT "a" FROM "t0" UNION ALL SELECT "a" FROM "t1" '
                      'ORDER BY "a" ASC LIMIT 3')


def test_intersect_except():
    l = Project(scan("t0"), [col("a")])
    r = Project(scan("t1"), [col("a")])
    assert sql(SetOp(l, r, "INTERSECT")) == \
        'SELECT "a" FROM "t0" INTERSECT SELECT "a" FROM "t1"'
    assert sql(SetOp(l, r, "EXCEPT", all=True)) == \
        'SELECT "a" FROM "t0" EXCEPT ALL SELECT "a" FROM "t1"'


# ---------------------------------------------------------------------------
# every golden that targets the duckdb dialect must actually run on DuckDB
# ---------------------------------------------------------------------------

def _duck():
    conn = duckdb.connect()
    conn.execute("CREATE TABLE remote_table(a BIGINT, b VARCHAR, c DATE)")
    conn.execute("INSERT INTO remote_table VALUES (1,'x',DATE '2024-01-01'),"
                 "(2,'y',DATE '2024-01-02'),(3,'x',DATE '2024-01-03')")
    for t in ("orders_t", "customer_t"):
        conn.execute(f"CREATE TABLE {t}(k BIGINT, v VARCHAR)")
        conn.execute(f"INSERT INTO {t} VALUES (1,'a'),(2,'b')")
    return conn


def test_goldens_execute_on_duckdb():
    conn = _duck()
    plans = [
        Project(scan(), [col("a"), col("b")]),
        Aggregate(scan(), [col("b")], [Alias(agg("sum", col("a")), "s")]),
        Filter(Aggregate(scan(), [col("b")],
                         [Alias(agg("sum", col("a")), "s")]),
               BinaryOp(">", col("s"), lit(0))),
        Limit(Project(scan(), [col("a")]), fetch=0, skip=0),
        Distinct(Project(scan(), [col("b")])),
        Union([Limit(Project(scan(), [col("a")]), fetch=1),
               Project(scan(), [col("a")])], all=True),
    ]
    for p in plans:
        q = sql(p, "duckdb")
        conn.execute(q).fetchall()  # raises on invalid SQL


def test_semi_anti_goldens_execute_on_duckdb():
    conn = _duck()
    l = scan("orders_t")
    r = scan("customer_t")
    cond = BinaryOp("=", Col("k", "orders_t"), Col("k", "customer_t"))
    for how in ("semi", "anti"):
        p = Project(Join(l, r, how=how, condition=cond),
                    [Col("k", "orders_t")])
        conn.execute(sql(p, "duckdb")).fetchall()


def test_exists_fallback_executes_on_duckdb():
    # the ANSI EXISTS spelling is also valid DuckDB — prove it runs
    conn = _duck()
    l = scan("orders_t")
    r = scan("customer_t")
    cond = BinaryOp("=", Col("k", "orders_t"), Col("k", "customer_t"))
    p = Project(Join(l, r, how="semi", condition=cond),
                [Col("k", "orders_t")])
    rows = conn.execute(sql(p, "ansi")).fetchall()
    assert rows == [(1,), (2,)]


# ---------------------------------------------------------------------------
# remaining expression arms (Not/Negative, IS TRUE family, SimilarTo,
# Cast/TryCast, null ordering)
# ---------------------------------------------------------------------------

def test_not_negative_golden():
    from datafusion_federation_spark.expressions import Negative, Not
    p = Project(scan(), [Not(col("a")), Negative(col("a"))])
    assert sql(p) == 'SELECT (NOT "a"), (- "a") FROM "remote_table"'


def test_is_true_family_golden():
    from datafusion_federation_spark.expressions import IsTrue
    p = Filter(scan(), IsTrue(col("a"), "TRUE"))
    assert sql(p) == 'SELECT * FROM "remote_table" WHERE "a" IS TRUE'
    p = Filter(scan(), IsTrue(col("a"), "UNKNOWN", negated=True))
    assert sql(p) == 'SELECT * FROM "remote_table" WHERE "a" IS NOT UNKNOWN'


def test_similar_to_per_dialect():
    from datafusion_federation_spark.expressions import SimilarTo
    e = SimilarTo(col("b"), lit("^a.*"))
    p = Filter(scan(), e)
    assert "REGEXP_MATCHES" in sql(p, "duckdb")
    assert '"b" ~ ' in sql(p, "postgres")
    assert "RLIKE" in sql(p, "spark")


def test_cast_try_cast_golden():
    from datafusion_federation_spark.expressions import Cast
    p = Project(scan(), [Cast(col("a"), "string"),
                         Cast(col("b"), "bigint", try_cast=True)])
    assert sql(p) == ('SELECT CAST("a" AS VARCHAR), TRY_CAST("b" AS BIGINT) '
                      'FROM "remote_table"')
    # sqlite maps types differently
    assert sql(p, "sqlite") == ('SELECT CAST("a" AS TEXT), '
                                'TRY_CAST("b" AS INTEGER) '
                                'FROM "remote_table"')


def test_sort_null_ordering_golden():
    p = Sort(Project(scan(), [col("a")]),
             [SortKey(col("a"), ascending=False, nulls_first=True)])
    out = sql(p)
    assert "DESC" in out and "NULLS FIRST" in out


def test_ilike_per_dialect():
    from datafusion_federation_spark.expressions import Like
    e = Like(col("b"), lit("x%"), case_insensitive=True)
    p = Filter(scan(), e)
    assert "ILIKE" in sql(p, "postgres")
    assert "ILIKE" not in sql(p, "sqlite")   # sqlite LIKE is already CI


def test_agg_filter_order_by_golden():
    from datafusion_federation_spark.expressions import AggFunc
    a = AggFunc("sum", [col("a")], filter=BinaryOp(">", col("a"), lit(0)))
    p = Aggregate(scan(), [], [Alias(a, "s")])
    assert sql(p) == ('SELECT SUM("a") FILTER (WHERE ("a" > 0)) AS "s" '
                      'FROM "remote_table"')
    d = AggFunc("count", [col("a")], distinct=True)
    p = Aggregate(scan(), [], [Alias(d, "n")])
    assert sql(p) == 'SELECT COUNT(DISTINCT "a") AS "n" FROM "remote_table"'


def test_scalar_function_name_mapping_per_dialect():
    from datafusion_federation_spark.expressions import func
    e = func("substring", col("b"), lit(1), lit(3))
    p = Project(scan(), [e.alias("s")])
    assert 'substring("b", 1, 3)' in sql(p, "duckdb")    # native
    assert 'substr("b", 1, 3)' in sql(p, "sqlite")       # renamed
    assert 'substring("b", 1, 3)' in sql(p, "postgres")  # untouched
    e2 = func("locate", lit("x"), col("b"))
    assert "strpos(\"b\", 'x')" in \
        sql(Project(scan(), [e2.alias("p")]), "duckdb")  # arg swap


# ---------------------------------------------------------------------------
# second review-pass regressions
# ---------------------------------------------------------------------------

def test_nested_set_ops_scoped():
    a = Project(scan("t0"), [col("x")])
    b = Project(scan("t1"), [col("x")])
    c = Project(scan("t2"), [col("x")])
    # (A UNION B) INTERSECT C must not re-associate to A UNION (B ∩ C)
    p = SetOp(Union([a, b], all=False), c, "INTERSECT")
    out = sql(p)
    assert out.startswith('SELECT * FROM (SELECT "x" FROM "t0" UNION ')
    # UNION of (UNION ALL) keeps the inner ALL scoped
    p2 = Union([a, Union([b, c], all=True)], all=False)
    assert "(SELECT" in sql(p2)


def test_sort_above_limit_over_union_not_flattened():
    u = Union([Project(scan("t0"), [col("x")]),
               Project(scan("t1"), [col("x")])], all=True)
    # "take 5 rows, then sort them" — must NOT become ORDER BY .. LIMIT 5
    p = Sort(Limit(u, fetch=5), [SortKey(col("x"))])
    out = sql(p)
    assert "LIMIT 5" in out and out.index("LIMIT 5") < out.index("ORDER BY")


def test_stacked_limits_inner_wins():
    u = Union([Project(scan("t0"), [col("x")]),
               Project(scan("t1"), [col("x")])], all=True)
    p = Limit(Limit(u, fetch=3), fetch=5)
    out = sql(p)
    # both limits survive in nested scopes
    assert "LIMIT 3" in out and "LIMIT 5" in out


def test_aggregate_over_sort_drops_inherited_order():
    ag = Aggregate(Sort(scan(), [SortKey(col("c"))]), [col("b")],
                   [Alias(agg("sum", col("a")), "s")])
    out = sql(ag)
    # the inherited ORDER BY over a non-grouped column must be scoped
    # inside a derived table, not attached to the GROUP BY shell
    assert not out.endswith('ORDER BY "c" ASC')


def test_window_over_distinct_dedups_first():
    from datafusion_federation_spark.expressions import WindowFunc, func
    from datafusion_federation_spark.plans.nodes import Window as WinNode
    rk = Alias(WindowFunc(func("row_number"),
                          order_by=[SortKey(col("a"))]), "rn")
    p = WinNode(Distinct(Project(scan(), [col("a")])), [rk])
    out = sql(p)
    assert "FROM (SELECT DISTINCT" in out


def test_wrapped_join_input_keeps_natural_alias():
    # a projected left side that must wrap keeps its table name as the
    # derived-table alias, so the qualified ON condition still resolves
    l = Project(scan("orders"), [Col("o_orderkey", "orders"),
                                 Col("o_custkey", "orders")])
    r = scan("customer")
    cond = BinaryOp("=", Col("o_custkey", "orders"),
                    Col("c_custkey", "customer"))
    p = Project(Join(l, r, condition=cond), [Col("o_orderkey", "orders")])
    out = sql(p)
    assert 'AS "orders"' in out
    assert "__q" not in out
    # and it actually runs
    conn = _duck()
    conn.execute('CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT)')
    conn.execute('CREATE TABLE customer(c_custkey BIGINT)')
    conn.execute(out)


def test_exists_fallback_wrapped_left_side_runs():
    conn = _duck()
    conn.execute("CREATE TABLE ord2(id BIGINT, k BIGINT)")
    conn.execute("INSERT INTO ord2 VALUES (1, 1), (2, 9)")
    l = Project(scan("ord2"), [Col("id", "ord2"), Col("k", "ord2")])
    r = scan("customer_t")
    cond = BinaryOp("=", Col("k", "ord2"), Col("k", "customer_t"))
    p = Project(Join(l, r, how="semi", condition=cond), [Col("id", "ord2")])
    rows = conn.execute(sql(p, "ansi")).fetchall()
    assert rows == [(1,)]


# ---------------------------------------------------------------------------
# dialect function maps — every mapping EXECUTED live on DuckDB and/or
# SQLite with value assertions (round-3 item: date/time + string breadth)
# ---------------------------------------------------------------------------

def _func_plan(fname, *args):
    from datafusion_federation_spark.expressions import Func
    return Project(scan("ft"), [Alias(Func(fname, list(args)), "r")])


def _run_duck(plan):
    conn = duckdb.connect()
    conn.execute("CREATE TABLE ft(ts TIMESTAMP, s VARCHAR, x DOUBLE)")
    conn.execute("INSERT INTO ft VALUES "
                 "(TIMESTAMP '2024-03-07 14:05:09', 'hello world', 100.0)")
    return conn.execute(sql(plan, "duckdb")).fetchall()[0][0]


def _run_sqlite(plan):
    import sqlite3
    conn = sqlite3.connect(":memory:")
    conn.execute("CREATE TABLE ft(ts TEXT, s TEXT, x REAL)")
    conn.execute("INSERT INTO ft VALUES "
                 "('2024-03-07 14:05:09', 'hello world', 100.0)")
    return conn.execute(sql(plan, "sqlite")).fetchall()[0][0]


@pytest.mark.parametrize("fname,want", [
    ("year", 2024), ("month", 3), ("day", 7), ("dayofmonth", 7),
    ("hour", 14), ("minute", 5), ("second", 9),
])
def test_datepart_functions_duckdb_and_sqlite(fname, want):
    p = _func_plan(fname, col("ts"))
    assert _run_duck(p) == want
    assert _run_sqlite(p) == want


def test_date_format_translates_java_pattern():
    p = _func_plan("date_format", col("ts"), lit("yyyy-MM-dd HH:mm:ss"))
    assert _run_duck(p) == "2024-03-07 14:05:09"
    assert _run_sqlite(p) == "2024-03-07 14:05:09"
    # spelling goldens: DuckDB strftime(ts, fmt); sqlite strftime(fmt, ts)
    assert sql(p, "duckdb") == (
        "SELECT strftime(\"ts\", '%Y-%m-%d %H:%M:%S') AS \"r\" "
        'FROM "ft"')
    assert sql(p, "sqlite") == (
        "SELECT strftime('%Y-%m-%d %H:%M:%S', \"ts\") AS \"r\" "
        'FROM "ft"')
    assert sql(p, "mysql") == (
        "SELECT DATE_FORMAT(`ts`, '%Y-%m-%d %H:%i:%s') AS `r` "
        "FROM `ft`")
    assert sql(p, "postgres") == (
        "SELECT to_char(\"ts\", 'YYYY-MM-DD HH24:MI:SS') AS \"r\" "
        'FROM "ft"')


def test_date_format_refuses_nonliteral_format():
    p = _func_plan("date_format", col("ts"), col("s"))
    with pytest.raises(ValueError, match="literal"):
        sql(p, "duckdb")


def test_date_format_refuses_untranslatable_token():
    p = _func_plan("date_format", col("ts"), lit("QQ"))
    with pytest.raises(ValueError, match="translate"):
        sql(p, "duckdb")


def test_date_trunc_duckdb_sqlite_mysql():
    p = _func_plan("date_trunc", lit("month"), col("ts"))
    assert str(_run_duck(p)).startswith("2024-03-01")
    assert _run_sqlite(p) == "2024-03-01"
    assert sql(p, "mysql") == (
        "SELECT DATE_FORMAT(`ts`, '%Y-%m-01') AS `r` FROM `ft`")
    p = _func_plan("date_trunc", lit("year"), col("ts"))
    assert _run_sqlite(p) == "2024-01-01"
    with pytest.raises(ValueError, match="unit"):
        sql(_func_plan("date_trunc", lit("week"), col("ts")), "sqlite")


@pytest.mark.parametrize("args,want", [
    ((lit("world"), col("s")), 7),      # locate(sub, str) -> position
])
def test_locate_arg_swap(args, want):
    p = _func_plan("locate", *args)
    assert _run_duck(p) == want
    assert _run_sqlite(p) == want
    assert sql(p, "duckdb") == (
        "SELECT strpos(\"s\", 'world') AS \"r\" FROM \"ft\"")
    assert sql(p, "sqlite") == (
        "SELECT instr(\"s\", 'world') AS \"r\" FROM \"ft\"")


def test_instr_substring_executed():
    p = _func_plan("instr", col("s"), lit("world"))
    assert _run_duck(p) == 7
    assert _run_sqlite(p) == 7
    assert sql(p, "postgres") == (
        "SELECT strpos(\"s\", 'world') AS \"r\" FROM \"ft\"")
    p = _func_plan("substring", col("s"), lit(1), lit(5))
    assert _run_duck(p) == "hello"
    assert _run_sqlite(p) == "hello"


def test_concat_and_pipes_executed():
    from datafusion_federation_spark.expressions import Func
    p = _func_plan("concat", col("s"), lit("!"))
    assert _run_duck(p) == "hello world!"
    assert _run_sqlite(p) == "hello world!"      # || chain spelling
    assert sql(p, "sqlite") == (
        "SELECT (\"s\" || '!') AS \"r\" FROM \"ft\"")
    # the || operator itself: MySQL must spell it CONCAT
    p2 = Project(scan("ft"),
                 [Alias(BinaryOp("||", col("s"), lit("!")), "r")])
    assert _run_duck(p2) == "hello world!"
    assert _run_sqlite(p2) == "hello world!"
    assert sql(p2, "mysql") == (
        "SELECT CONCAT(`s`, '!') AS `r` FROM `ft`")


def test_math_functions_executed():
    p = _func_plan("log", col("x"))          # Spark log(x) = natural log
    import math
    assert abs(_run_duck(p) - math.log(100.0)) < 1e-12
    assert abs(_run_sqlite(p) - math.log(100.0)) < 1e-12
    p = _func_plan("power", col("x"), lit(2))
    assert _run_duck(p) == 10000.0
    assert _run_sqlite(p) == 10000.0


def test_pg_extract_spelling():
    p = _func_plan("year", col("ts"))
    assert sql(p, "postgres") == (
        'SELECT CAST(EXTRACT(YEAR FROM "ts") AS INTEGER) AS "r" '
        'FROM "ft"')


def test_two_arg_log_executed():
    """Spark log(b, x) = base-b logarithm; the ln-ratio translation is
    exact in double everywhere (Postgres native log(b,x) is
    numeric-only; DuckDB's bare log(x) is log10 — r3 review finding)."""
    import math
    p = _func_plan("log", lit(2), col("x"))
    assert abs(_run_duck(p) - math.log2(100.0)) < 1e-12
    assert abs(_run_sqlite(p) - math.log2(100.0)) < 1e-12
    assert sql(p, "postgres") == (
        'SELECT (ln("x") / ln(2)) AS "r" FROM "ft"')


def test_template_function_arity_mismatch_refuses():
    """str.format silently drops surplus args — a 3-arg locate through a
    2-arg template would lose the position argument and return wrong
    rows. The dialect must refuse (degrading to local compilation)."""
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    p = _func_plan("locate", lit("o"), col("s"), lit(6))
    for d in ("duckdb", "sqlite", "postgres"):
        with pytest.raises(UnsupportedUnparse):
            sql(p, d)
    # the 2-arg form still translates and executes
    p2 = _func_plan("locate", lit("world"), col("s"))
    assert _run_duck(p2) == 7
    assert _run_sqlite(p2) == 7


def test_derby_refuses_unsupported_functions():
    """Derby has no round()/power()/date_format(); the dialect must
    refuse (keeping the expression local) instead of shipping SQL that
    fails at JDBC execution — while true built-ins render verbatim."""
    import pytest
    from datafusion_federation_spark.dialects import (DIALECTS,
                                                      UnsupportedUnparse)
    d = DIALECTS["derby"]
    # "char" diverges silently: Spark char(65)='A' vs Derby CHAR(65)='65'
    for bad in ("round", "power", "date_format", "concat", "char"):
        with pytest.raises(UnsupportedUnparse):
            d.scalar_function(bad, ["x", "2"])
    assert d.scalar_function("abs", ["x"]) == "abs(x)"
    assert d.scalar_function("sqrt", ["x"]) == "sqrt(x)"


def test_is_distinct_from_dialect_renderings_executed():
    """IS [NOT] DISTINCT FROM is TOTAL (never NULL). Standard spelling
    for engines that have it; the Derby expansion (plain ANSI
    AND/OR/IS NULL) is executed HERE on DuckDB against the native form
    over the full 3x3 nullable truth table — proving the rewrite
    agrees everywhere, including as a PROJECTED value where a non-total
    expansion would leak NULL. MySQL's <=> form is golden-pinned."""
    import duckdb
    from datafusion_federation_spark.dialects import DIALECTS
    duck, derby, mysql = (DIALECTS[n] for n in
                          ("duckdb", "derby", "mysql"))
    assert duck.distinct_predicate("a", "b", False) == \
        "a IS DISTINCT FROM b"
    assert duck.distinct_predicate("a", "b", True) == \
        "a IS NOT DISTINCT FROM b"
    assert mysql.distinct_predicate("a", "b", False) == \
        "(NOT (a <=> b))"
    assert mysql.distinct_predicate("a", "b", True) == "(a <=> b)"
    conn = duckdb.connect()
    conn.execute("CREATE TABLE t AS SELECT a, b FROM "
                 "(VALUES (1, 1), (1, 2), (1, NULL), (NULL, 1), "
                 "(NULL, NULL)) v(a, b)")
    for neg in (False, True):
        native = conn.execute(
            f"SELECT a, b, {duck.distinct_predicate('a', 'b', neg)} "
            f"FROM t ORDER BY 1, 2").fetchall()
        expanded = conn.execute(
            f"SELECT a, b, {derby.distinct_predicate('a', 'b', neg)} "
            f"FROM t ORDER BY 1, 2").fetchall()
        assert native == expanded
        assert all(r[2] in (True, False) for r in native)  # total
    conn.close()


# -- IGNORE NULLS null treatment (r7 s3) -------------------------------------

def _ign_plan():
    from datafusion_federation_spark.expressions import WindowFunc, func
    lag = Alias(WindowFunc(func("lag", col("x")),
                           order_by=[SortKey(col("i"))],
                           ignore_nulls=True), "p")
    return Project(scan(), [col("i"), lag])


def test_ignore_nulls_postfix_ansi_spark():
    out = sql(_ign_plan())
    assert 'IGNORE NULLS OVER (ORDER BY "i" ASC)' in out
    out_s = sql(_ign_plan(), "spark")
    assert "IGNORE NULLS OVER" in out_s


def test_ignore_nulls_inline_duckdb_executes():
    out = sql(_ign_plan(), "duckdb")
    assert 'lag("x" IGNORE NULLS) OVER' in out
    con = duckdb.connect()
    con.execute("CREATE TABLE remote_table AS SELECT * FROM (VALUES "
                "(1, 10), (2, NULL), (3, 30)) v(i, x)")
    got = con.execute(out + " ORDER BY i").fetchall()
    assert got == [(1, None), (2, 10), (3, 10)]


@pytest.mark.parametrize("dialect,msg", [
    ("postgres", "IGNORE NULLS"), ("sqlite", "IGNORE NULLS"),
    ("mysql", "IGNORE NULLS"),
    # derby refuses one step earlier: lag() is not in its function map
    ("derby", "lag"),
])
def test_ignore_nulls_refused_without_syntax(dialect, msg):
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    with pytest.raises(UnsupportedUnparse, match=msg):
        sql(_ign_plan(), dialect)


def test_ignore_nulls_with_filter_refused_every_dialect():
    # review r7 s3 finding #5: FILTER + IGNORE NULLS on one window call
    # is inexpressible on every target engine (DuckDB refuses FILTER on
    # non-aggregate window functions; Spark refuses window-aggregate
    # FILTER outright) — the unparser must refuse so the subtree
    # compiles locally, where the when()-mask lowering is exact
    # (pinned in test_sqlfront.test_ignore_nulls_with_filter)
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    from datafusion_federation_spark.expressions import (
        AggFunc, WindowFunc)
    f = AggFunc("first", [col("x")],
                filter=BinaryOp("=", col("keep"), lit(1)))
    w = Alias(WindowFunc(f, order_by=[SortKey(col("i"))],
                         ignore_nulls=True), "fv")
    p = Project(scan(), [col("i"), w])
    for dialect in ("duckdb", "ansi", "spark"):
        with pytest.raises(UnsupportedUnparse, match="no remote"):
            sql(p, dialect)


def _excl_plan():
    from datafusion_federation_spark.expressions import (
        AggFunc, WindowFrame, WindowFunc)
    s = Alias(WindowFunc(
        AggFunc("sum", [col("x")]),
        order_by=[SortKey(col("i"))],
        frame=WindowFrame("RANGE", "UNBOUNDED PRECEDING", 0,
                          exclude="GROUP")), "s")
    return Project(scan(), [col("i"), s])


def test_frame_exclude_renders_on_duckdb_and_executes():
    out = sql(_excl_plan(), "duckdb")
    assert "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW " \
           "EXCLUDE GROUP" in out
    con = duckdb.connect()
    con.execute('CREATE TABLE remote_table (i INT, x INT)')
    con.execute("INSERT INTO remote_table VALUES (1, 10), (2, 20), (2, 5)")
    rows = con.execute(out).fetchall()
    # i=2 rows are each other's peers: each sees only i=1's 10; the
    # i=1 row's frame minus its peer group is empty -> NULL
    assert {(r[0], r[1]) for r in rows} == {(1, None), (2, 10)}


def test_frame_exclude_refused_without_syntax():
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    for dialect in ("spark", "mysql", "derby", "ansi"):
        with pytest.raises(UnsupportedUnparse, match="EXCLUDE"):
            sql(_excl_plan(), dialect)
    # Postgres/SQLite carry the SQL:2011 clause
    assert "EXCLUDE GROUP" in sql(_excl_plan(), "postgres")
    assert "EXCLUDE GROUP" in sql(_excl_plan(), "sqlite")


def _groups_plan():
    from datafusion_federation_spark.expressions import (
        AggFunc, WindowFrame, WindowFunc)
    s = Alias(WindowFunc(
        AggFunc("sum", [col("x")]),
        order_by=[SortKey(col("i"))],
        frame=WindowFrame("GROUPS", -1, 0)), "s")
    return Project(scan(), [col("i"), s])


def test_groups_frame_renders_on_sqlite_and_executes():
    out = sql(_groups_plan(), "sqlite")
    assert "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW" in out
    import sqlite3
    con = sqlite3.connect(":memory:")
    con.execute("CREATE TABLE remote_table (i INT, x INT)")
    con.executemany("INSERT INTO remote_table VALUES (?, ?)",
                    [(1, 10), (2, 20), (2, 5), (3, 40)])
    rows = con.execute(out).fetchall()
    # i=2 peers aggregate together; 1-PRECEDING spans one peer GROUP
    assert {tuple(r) for r in rows} == {(1, 10), (2, 35), (2, 35),
                                        (3, 65)}
    assert "GROUPS BETWEEN" in sql(_groups_plan(), "postgres")


def test_groups_frame_refused_without_mode():
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    for dialect in ("duckdb", "spark", "mysql", "derby", "ansi"):
        with pytest.raises(UnsupportedUnparse, match="GROUPS"):
            sql(_groups_plan(), dialect)


def test_within_group_renders_and_refuses():
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    from datafusion_federation_spark.expressions import AggFunc
    a = Alias(AggFunc("percentile_cont", [lit(0.5)],
                      order_by=[SortKey(col("x"))], within_group=True),
              "med")
    p = Aggregate(scan(), [col("g")], [a])
    out = sql(p, "duckdb")
    assert 'PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY "x" ASC)' in out
    con = duckdb.connect()
    con.execute("CREATE TABLE remote_table (g INT, x INT)")
    con.execute("INSERT INTO remote_table VALUES (1, 10), (1, 20), (2, 5)")
    assert {tuple(r) for r in con.execute(out).fetchall()} \
        == {(1, 15.0), (2, 5.0)}
    assert "WITHIN GROUP" in sql(p, "spark")
    for dialect in ("sqlite", "mysql", "derby", "ansi"):
        with pytest.raises(UnsupportedUnparse, match="WITHIN GROUP"):
            sql(p, dialect)


def test_within_group_over_window_refused_every_dialect():
    # DuckDB parses 'agg WITHIN GROUP OVER' to 'ORDER BY is not
    # implemented for window functions'; Postgres rejects ordered-set
    # aggregates in OVER — rendering it would fail REMOTELY at runtime
    # instead of degrading to the exact local lowering (review r7 s4)
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    from datafusion_federation_spark.expressions import (
        AggFunc, WindowFunc)
    wf = Alias(WindowFunc(
        AggFunc("percentile_cont", [lit(0.5)],
                order_by=[SortKey(col("x"))], within_group=True),
        partition_by=[col("g")]), "p")
    p = Project(scan(), [col("g"), wf])
    for dialect in ("duckdb", "postgres", "spark", "ansi"):
        with pytest.raises(UnsupportedUnparse, match="no remote"):
            sql(p, dialect)


def test_count_distinct_window_renders_duckdb_only():
    from datafusion_federation_spark.dialects import UnsupportedUnparse
    from datafusion_federation_spark.expressions import (
        AggFunc, WindowFunc)
    wf = Alias(WindowFunc(AggFunc("count", [col("x")], distinct=True),
                          partition_by=[col("g")]), "c")
    p = Project(scan(), [col("g"), wf])
    out = sql(p, "duckdb")
    assert 'COUNT(DISTINCT "x") OVER (PARTITION BY "g")' in out
    con = duckdb.connect()
    con.execute("CREATE TABLE remote_table (g INT, x INT)")
    con.execute("INSERT INTO remote_table VALUES (1,1),(1,1),(1,2)")
    assert {tuple(r) for r in con.execute(out).fetchall()} == {(1, 2)}
    for dialect in ("postgres", "sqlite", "mysql", "spark", "ansi"):
        with pytest.raises(UnsupportedUnparse, match="DISTINCT window"):
            sql(p, dialect)


# ---------------------------------------------------------------------------
# r12: the lowered hash-sample predicate — per-dialect rendering pins
# (the pushdown path ships EXACTLY this SQL; sqlite/derby refuse, the
# capability-gate degrade that keeps the sample local there)
# ---------------------------------------------------------------------------

def _sample_filter_plan():
    from datafusion_federation_spark.sqlfront import _make_tablesample
    from pyspark.sql import types as T
    handle = h("docs")
    handle.schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("lab", T.StringType())])
    return _make_tablesample(Scan(handle), 25.0, 7)


def test_sample_predicate_renders_duckdb_postgres_mysql():
    p = _sample_filter_plan()
    assert isinstance(p, Filter)
    want = ("SELECT * FROM \"docs\" WHERE "
            "(substring(md5(concat('7|', "
            "coalesce(md5(CAST(\"k\" AS VARCHAR)), 'N'), "
            "coalesce(md5(CAST(\"lab\" AS VARCHAR)), 'N'))), 1, 4) "
            "< '4000')")
    assert sql(p, "duckdb") == want
    assert sql(p, "postgres") == want
    # MySQL: backtick quoting and CHAR cast targets (CAST AS VARCHAR
    # is a syntax error there — r12 type_map fix)
    assert sql(p, "mysql") == (
        "SELECT * FROM `docs` WHERE "
        "(substring(md5(concat('7|', "
        "coalesce(md5(CAST(`k` AS CHAR)), 'N'), "
        "coalesce(md5(CAST(`lab` AS CHAR)), 'N'))), 1, 4) "
        "< '4000')")


def test_sample_predicate_refuses_sqlite_and_derby():
    import pytest as _pt

    from datafusion_federation_spark.dialects import UnsupportedUnparse
    p = _sample_filter_plan()
    for d in ("sqlite", "derby"):
        with _pt.raises(UnsupportedUnparse, match="md5"):
            sql(p, d)


def test_sample_predicate_boolean_renders_case_not_cast():
    """r13 (VERDICT r12 Next #1 / ADVICE r12): a boolean key column
    must NOT render through CAST-to-string — MySQL's BOOLEAN is
    TINYINT(1) and CAST(b AS CHAR) yields '1'/'0' while Spark/DuckDB/
    Postgres yield 'true'/'false', so a boolean-keyed pushed sample
    would silently select a DIFFERENT subset on a live MySQL. The
    NULL-preserving searched CASE renders 'true'/'false' identically
    on every pushdown dialect (NULL falls through to NULL -> the 'N'
    sentinel, exactly like every other type)."""
    from datafusion_federation_spark.sqlfront import _make_tablesample
    from pyspark.sql import types as T
    handle = h("docs")
    handle.schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("flag", T.BooleanType())])
    p = _make_tablesample(Scan(handle), 25.0, 7)
    assert isinstance(p, Filter)
    case = ("CASE WHEN \"flag\" THEN 'true' "
            "WHEN (NOT \"flag\") THEN 'false' END")
    want = ("SELECT * FROM \"docs\" WHERE "
            "(substring(md5(concat('7|', "
            "coalesce(md5(CAST(\"k\" AS VARCHAR)), 'N'), "
            f"coalesce(md5({case}), 'N'))), 1, 4) "
            "< '4000')")
    assert sql(p, "duckdb") == want
    assert sql(p, "postgres") == want
    out = sql(p, "mysql")
    assert "CAST(`flag`" not in out
    assert out == (
        "SELECT * FROM `docs` WHERE "
        "(substring(md5(concat('7|', "
        "coalesce(md5(CAST(`k` AS CHAR)), 'N'), "
        "coalesce(md5(CASE WHEN `flag` THEN 'true' "
        "WHEN (NOT `flag`) THEN 'false' END), 'N'))), 1, 4) "
        "< '4000')")


def test_postgres_cast_targets():
    """r13 (caught by LIVE PostgreSQL execution of the surface sweep):
    PostgreSQL has no DOUBLE or TINYINT types — CAST(x AS DOUBLE)
    raises `type "double" does not exist` on the real engine. The
    correct targets are DOUBLE PRECISION and SMALLINT."""
    from datafusion_federation_spark.expressions import Cast, Col
    p = Project(scan(), [Cast(Col("a"), "double"),
                         Cast(Col("a"), "byte"),
                         Cast(Col("a"), "float")])
    out = sql(p, "postgres")
    assert 'CAST("a" AS DOUBLE PRECISION)' in out
    assert 'CAST("a" AS SMALLINT)' in out
    assert 'CAST("a" AS REAL)' in out
