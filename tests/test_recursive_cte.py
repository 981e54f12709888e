"""WITH RECURSIVE through the SQL front door (r7).

The reference's ctx.sql inherits recursive CTEs from DataFusion's SQL
layer; Spark 4.1's native support covers UNION ALL only
(UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so the front-door fixpoint in
compiler._compile_recursive is the only Spark path for the distinct
form. Semantics pinned here against hand-computed fixpoints and DuckDB
(via the q88/q89 oracle rows); refusals, convergence, the iteration
cap, NULL set-semantics, plan linearity, and the federation boundary
each get a test.
"""

from __future__ import annotations

import pytest

from tests.conftest import TESTDATA


def _engine(spark, tables=()):
    from datafusion_federation_spark.engine import FederationEngine
    eng = FederationEngine(spark)
    for t in tables:
        eng.register_local_df(
            t, spark.read.parquet(f"{TESTDATA}/{t}.parquet"))
    return eng


# ---------------------------------------------------------------------------
# parsing + plan shape
# ---------------------------------------------------------------------------

def _parse(sql):
    from datafusion_federation_spark.sqlfront import parse_sql

    class H:
        def __init__(self, name):
            self.local_name = name
            self.provider = None
            self.schema = None
            self.fallback_path = None

    return parse_sql(sql, lambda n: H(n))


def test_parse_splits_base_and_step():
    from datafusion_federation_spark.plans.nodes import (
        RecursiveCTE, walk_plan)
    p = _parse("WITH RECURSIVE t(n) AS ("
               "SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 5) "
               "SELECT n FROM t")
    ctes = [n for n in walk_plan(p) if isinstance(n, RecursiveCTE)]
    assert len(ctes) == 1
    cte = ctes[0]
    assert cte.union_all is True
    assert cte.cols == ["n"]
    from datafusion_federation_spark.plans.nodes import RecursiveRef
    assert not any(isinstance(n, RecursiveRef) for n in walk_plan(cte.base))
    assert any(isinstance(n, RecursiveRef) for n in walk_plan(cte.step))


def test_parse_union_distinct_mode():
    from datafusion_federation_spark.plans.nodes import (
        RecursiveCTE, walk_plan)
    p = _parse("WITH RECURSIVE t(n) AS ("
               "SELECT 1 UNION SELECT n FROM t) SELECT n FROM t")
    cte = next(n for n in walk_plan(p) if isinstance(n, RecursiveCTE))
    assert cte.union_all is False


def test_non_recursive_body_under_recursive_keyword():
    # RECURSIVE permits, not mandates: a body with no self-reference
    # parses as an ordinary CTE
    from datafusion_federation_spark.plans.nodes import (
        RecursiveCTE, walk_plan)
    p = _parse("WITH RECURSIVE t AS (SELECT 1 AS n) SELECT n FROM t")
    assert not any(isinstance(n, RecursiveCTE) for n in walk_plan(p))


@pytest.mark.parametrize("sql,msg", [
    # self-reference without any UNION: not base-UNION-step shaped
    ("WITH RECURSIVE t(n) AS (SELECT n FROM t) SELECT n FROM t",
     "UNION"),
    ("WITH RECURSIVE t(n) AS (SELECT n + 1 FROM t WHERE n < 3) "
     "SELECT n FROM t", "UNION"),
    # UNION-shaped but every branch references the working table
    ("WITH RECURSIVE t(n) AS (SELECT n FROM t UNION ALL "
     "SELECT n + 1 FROM t) SELECT n FROM t", "non-recursive"),
    # working table referenced twice in one step branch
    ("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
     "SELECT a.n + b.n FROM t a JOIN t b ON a.n = b.n) SELECT n FROM t",
     "only once"),
    # aggregation over the working table
    ("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
     "SELECT MAX(n) + 1 FROM t GROUP BY n) SELECT n FROM t",
     "aggregation"),
    # working table inside a subquery expression
    ("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
     "SELECT n + 1 FROM t WHERE n IN (SELECT n FROM t)) SELECT n FROM t",
     "only once"),
    # INTERSECT over the working table (binds tighter than UNION, so
    # the second branch is a SetOp containing the self-reference)
    ("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
     "SELECT n + 1 FROM t INTERSECT SELECT 2) SELECT n FROM t",
     "EXCEPT/INTERSECT"),
])
def test_refusals(sql, msg):
    from datafusion_federation_spark.sqlfront import SqlParseError
    with pytest.raises(SqlParseError, match=msg):
        _parse(sql)


def test_column_list_refused_without_recursive():
    from datafusion_federation_spark.sqlfront import SqlParseError
    with pytest.raises(SqlParseError, match="RECURSIVE"):
        _parse("WITH t(n) AS (SELECT 1) SELECT n FROM t")


# ---------------------------------------------------------------------------
# FROM-less SELECT (OneRow)
# ---------------------------------------------------------------------------

def test_fromless_select_parses_to_onerow():
    from datafusion_federation_spark.plans.nodes import OneRow, walk_plan
    p = _parse("SELECT 1 AS a, 'x' AS b")
    assert any(isinstance(n, OneRow) for n in walk_plan(p))


def test_fromless_select_executes(spark):
    eng = _engine(spark)
    rows = eng.sql("SELECT 1 AS a, 2 + 3 AS b").collect()
    assert len(rows) == 1 and rows[0].a == 1 and rows[0].b == 5


def test_fromless_union_branches(spark):
    eng = _engine(spark)
    got = sorted(r.v for r in
                 eng.sql("SELECT 1 AS v UNION ALL SELECT 2").collect())
    assert got == [1, 2]


def test_fromless_does_not_break_from_queries(spark):
    # regression guard for the FROM pre-scan rewrite: a normal query
    # with a scalar subquery in the select list still binds its FROM
    eng = _engine(spark, ["region"])
    rows = eng.sql(
        "SELECT r_name, (SELECT COUNT(*) FROM region) AS n "
        "FROM region ORDER BY r_name LIMIT 2").collect()
    assert len(rows) == 2 and rows[0].n == 5


# ---------------------------------------------------------------------------
# fixpoint execution semantics
# ---------------------------------------------------------------------------

def test_union_all_series(spark):
    eng = _engine(spark)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 10) "
        "SELECT CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS c FROM t"
    ).collect()
    assert rows[0].s == 55 and rows[0].c == 10


def test_union_distinct_terminates_on_cycle(spark):
    # 1 -> 2 -> 3 -> 1 cycle: UNION ALL would never converge; UNION's
    # subtract-against-accumulated reaches the fixpoint in 3 rounds
    eng = _engine(spark)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION "
        "SELECT n % 3 + 1 FROM t) "
        "SELECT CAST(SUM(n) AS BIGINT) AS s FROM t").collect()
    assert rows[0].s == 6


def test_union_distinct_null_rows_dedup(spark):
    # NULL rows must dedup under set semantics (subtract/EXCEPT), not
    # join equality — a NULL-keyed anti-join would keep re-adding the
    # NULL row forever
    eng = _engine(spark)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS ("
        "SELECT CAST(NULL AS INT) UNION SELECT n FROM t) "
        "SELECT COUNT(*) AS c FROM t").collect()
    assert rows[0].c == 1


def test_max_iterations_guard(spark):
    eng = _engine(spark)
    with pytest.raises(Exception, match="did not converge"):
        eng.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM t) SELECT COUNT(*) AS c FROM t").collect()


def test_multiple_base_and_step_branches(spark):
    eng = _engine(spark)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS ("
        "SELECT 1 UNION SELECT 100 "
        "UNION SELECT n + 1 FROM t WHERE n < 3) "
        "SELECT CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS c FROM t"
    ).collect()
    # {1, 100, 2, 3}
    assert rows[0].s == 106 and rows[0].c == 4


def test_cte_referenced_twice_runs_fixpoint_once(spark):
    # the parser shares one RecursiveCTE node across mentions; the
    # compiler caches by id() so both references see one fixpoint
    eng = _engine(spark)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 4) "
        "SELECT a.n FROM t a JOIN t b ON a.n = b.n ORDER BY a.n"
    ).collect()
    assert [r.n for r in rows] == [1, 2, 3, 4]


def test_recursive_cte_over_table(spark):
    # depth histogram equals log-halving of the part keyspace
    eng = _engine(spark, ["part"])
    rows = eng.sql(
        "WITH RECURSIVE anc(pk, node, d) AS ("
        "SELECT p_partkey, p_partkey, 0 FROM part UNION ALL "
        "SELECT a.pk, CAST(FLOOR(a.node / 2) AS BIGINT), a.d + 1 "
        "FROM anc a WHERE a.node > 1) "
        "SELECT d, COUNT(*) AS n FROM anc GROUP BY d ORDER BY d"
    ).collect()
    import duckdb
    want = duckdb.connect().execute(
        "WITH RECURSIVE anc(pk, node, d) AS ("
        "SELECT p_partkey, p_partkey, 0 FROM "
        f"'{TESTDATA}/part.parquet' UNION ALL "
        "SELECT pk, CAST(FLOOR(node / 2) AS BIGINT), d + 1 "
        "FROM anc WHERE node > 1) "
        "SELECT d, COUNT(*) AS n FROM anc GROUP BY d ORDER BY d"
    ).fetchall()
    assert [(r.d, r.n) for r in rows] == want


def test_plan_stays_linear_at_depth(spark):
    # 40 rounds: an un-checkpointed formulation doubles the plan per
    # round (the d51/d68 lesson) and dies long before 40; the
    # checkpointed loop's plan is linear and this stays fast
    eng = _engine(spark)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 40) "
        "SELECT COUNT(*) AS c FROM t").collect()
    assert rows[0].c == 40


# ---------------------------------------------------------------------------
# federation boundary
# ---------------------------------------------------------------------------

def test_recursion_stays_local_but_base_can_federate(duckdb_engine):
    # base term scans a remote table -> that scan is claimed; the
    # recursive term (working-table join) stays local
    from datafusion_federation_spark.federation import federate
    from datafusion_federation_spark.plans.nodes import (
        RecursiveCTE, RecursiveRef, RemoteQueryNode, walk_plan)
    eng, _ex = duckdb_engine
    plan = eng.sql_plan(
        "WITH RECURSIVE t(k) AS ("
        "SELECT c_custkey FROM customer WHERE c_custkey < 3 "
        "UNION ALL SELECT k + 100 FROM t WHERE k < 200) "
        "SELECT COUNT(*) AS c FROM t").plan
    fed = federate(plan)
    cte = next(n for n in walk_plan(fed) if isinstance(n, RecursiveCTE))
    assert any(isinstance(n, RemoteQueryNode) for n in walk_plan(cte.base))
    assert not any(isinstance(n, RemoteQueryNode)
                   for n in walk_plan(cte.step))
    assert any(isinstance(n, RecursiveRef) for n in walk_plan(cte.step))
    # and it executes correctly end to end
    rows = eng.execute(fed).collect()
    assert rows[0].c == 9  # {0,1,2} + {100,101,102} + {200,201,202}


def test_fixpoint_runs_once_through_full_engine_path(spark):
    # review r7 s3 finding #6: federate()'s rebuild passes used to split
    # the shared RecursiveCTE object, running the fixpoint once per
    # mention; the optimizer now preserves node identity for unchanged
    # subtrees and the compiler counts fixpoint executions
    eng = _engine(spark)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 4) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS c FROM t a JOIN t b "
        "ON a.n = b.n").collect()
    assert rows[0].c == 4
    assert eng.compiler.fixpoint_runs == 1


def test_recursive_step_remote_dim_fetched_once(spark):
    # review r7 s3 finding #7: a federated dimension inside the
    # recursive step used to re-execute its remote SQL every round;
    # the pinned static leaf fetches once
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)

    calls = {"n": 0}

    class CountingExec(DuckDBExecutor):
        def execute(self, spark_, sql, schema=None):
            calls["n"] += 1
            return super().execute(spark_, sql, schema)

    ex = CountingExec(name="count_rec", compute_context="test")
    ex.register_parquet("customer", f"{TESTDATA}/customer.parquet")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "customer")
    df = eng.sql("""
WITH RECURSIVE reach(u) AS (
  SELECT CAST(1 AS BIGINT) AS u
  UNION
  SELECT (e.c_custkey * 7 + 3) % 50 FROM reach r
  JOIN customer e ON e.c_custkey = r.u
)
SELECT CAST(COUNT(*) AS BIGINT) AS c FROM reach""")
    rows = df.collect()
    assert rows[0].c >= 1
    assert calls["n"] <= 2, \
        f"remote dim executed {calls['n']}x across fixpoint rounds"


def test_federated_base_cte_referenced_twice_stays_shared(spark):
    # ADVICE r8: _optimize_recursively rebuilt parents with no per-id
    # memoization, so a RecursiveCTE referenced twice whose BASE holds a
    # federated claim split into two node objects after federate() —
    # defeating the compiler's id()-keyed caches (fixpoint + static
    # leaf reuse) and running the fixpoint/remote SQL once per mention.
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.plans.nodes import (
        RecursiveCTE, walk_plan)
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)

    calls = {"n": 0}

    class CountingExec(DuckDBExecutor):
        def execute(self, spark_, sql, schema=None):
            calls["n"] += 1
            return super().execute(spark_, sql, schema)

    ex = CountingExec(name="count_shared", compute_context="test")
    ex.register_parquet("customer", f"{TESTDATA}/customer.parquet")
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(ex), "customer")

    plan = eng.sql_plan(
        "WITH RECURSIVE t(k) AS ("
        "SELECT c_custkey FROM customer WHERE c_custkey < 3 "
        "UNION ALL SELECT k + 100 FROM t WHERE k < 200) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS c FROM t a JOIN t b "
        "ON a.k = b.k").plan
    from datafusion_federation_spark.federation import federate
    fed = federate(plan)
    ctes = [n for n in walk_plan(fed) if isinstance(n, RecursiveCTE)]
    ids = {id(n) for n in ctes}
    assert len(ids) == 1, \
        f"shared RecursiveCTE split into {len(ids)} objects by federate()"

    rows = eng.execute(fed).collect()
    assert rows[0].c == 9
    assert eng.compiler.fixpoint_runs == 1
    assert calls["n"] <= 1, \
        f"federated base executed {calls['n']}x for one shared CTE"


# ---------------------------------------------------------------------------
# SQL:1999 / Postgres 14 SEARCH + CYCLE clauses (r8)
# ---------------------------------------------------------------------------

def _duck(sql):
    import duckdb
    con = duckdb.connect()
    try:
        return sorted(map(tuple, con.execute(sql).fetchall()))
    finally:
        con.close()


def test_cycle_terminates_union_all_on_cyclic_graph(spark):
    # without CYCLE this recursion never converges (max_iterations);
    # with it, the repeat row surfaces marked and recursion stops
    from pyspark.sql import functions as F
    eng = _engine(spark)
    df = eng.sql("""
WITH RECURSIVE walk(n) AS (
  SELECT 0 UNION ALL SELECT (3 * n + 1) % 10 FROM walk
) CYCLE n SET is_cycle USING path
SELECT n, is_cycle, path FROM walk""")
    got = sorted(tuple(r) for r in df.select(
        "n", "is_cycle",
        F.array_join(F.transform("path", lambda x: x.cast("string")),
                     "->").alias("p")).collect())
    want = _duck("""
WITH RECURSIVE walk(n, is_cycle, path) AS (
  SELECT 0, false, [0]
  UNION ALL
  SELECT (3*n+1)%10, list_contains(path, (3*n+1)%10),
         list_append(path, (3*n+1)%10)
  FROM walk WHERE NOT is_cycle
)
SELECT n, is_cycle, array_to_string(path, '->') FROM walk""")
    assert got == want
    # the unguarded recursion really is the non-terminating class
    with pytest.raises(RuntimeError, match="did not converge"):
        eng.sql("WITH RECURSIVE w(n) AS (SELECT 0 UNION ALL "
                "SELECT (3 * n + 1) % 10 FROM w) "
                "SELECT CAST(COUNT(*) AS BIGINT) AS c FROM w").collect()


def test_cycle_multi_key_struct_path(spark):
    # composite cycle key: the path tracks (a, b) STRUCTS; the orbit of
    # ((a+1)%3, (b+2)%4) from (0,0) has lcm(3, 2)=6 states (b strides
    # by 2, so its period is 2) — cross-checked against DuckDB's manual
    # rewrite rather than hand math
    eng = _engine(spark)
    got = sorted(tuple(r) for r in eng.sql("""
WITH RECURSIVE w(a, b) AS (
  SELECT 0, 0
  UNION ALL SELECT (a + 1) % 3, (b + 2) % 4 FROM w
) CYCLE a, b SET ic USING p
SELECT a, b, ic FROM w""").collect())
    want = _duck("""
WITH RECURSIVE w(a, b, ic, p) AS (
  SELECT 0, 0, false, [(0, 0)]
  UNION ALL
  SELECT (a+1)%3, (b+2)%4,
         list_contains(p, ((a+1)%3, (b+2)%4)),
         list_append(p, ((a+1)%3, (b+2)%4))
  FROM w WHERE NOT ic
)
SELECT a, b, ic FROM w""")
    assert got == want
    assert len(got) == 7 and sum(1 for r in got if r[2]) == 1


def test_search_breadth_first_levels(spark):
    eng = _engine(spark)
    got = sorted(tuple(r) for r in eng.sql("""
WITH RECURSIVE r(n) AS (
  SELECT 1 UNION ALL SELECT n * 2 FROM r WHERE n < 8
) SEARCH BREADTH FIRST BY n SET o
SELECT n, o.level AS lvl FROM r""").collect())
    assert got == [(1, 0), (2, 1), (4, 2), (8, 3)]


def test_search_depth_first_path_ordering(spark):
    from pyspark.sql import functions as F
    eng = _engine(spark)
    df = eng.sql("""
WITH RECURSIVE r(n) AS (
  SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 4
) SEARCH DEPTH FIRST BY n SET o
SELECT n, o FROM r""")
    # the DFS ordering column IS the root-to-row key path
    got = {r.n: r.p for r in df.select(
        "n", F.array_join(F.transform("o", lambda x: x.cast("string")),
                          ".").alias("p")).collect()}
    assert got == {1: "1", 2: "1.2", 3: "1.2.3", 4: "1.2.3.4"}
    # and Spark can ORDER BY the array column (DFS iteration order)
    ordered = [r.n for r in df.orderBy("o").collect()]
    assert ordered == [1, 2, 3, 4]


def test_search_and_cycle_compose(spark):
    eng = _engine(spark)
    rows = eng.sql("""
WITH RECURSIVE w(n) AS (
  SELECT 0 UNION ALL SELECT (n + 3) % 5 FROM w
) SEARCH BREADTH FIRST BY n SET o
  CYCLE n SET ic USING p
SELECT n, o.level AS lvl, ic FROM w""").collect()
    assert len(rows) == 6                       # 5 states + marked repeat
    assert max(r.lvl for r in rows) == 5
    assert sum(1 for r in rows if r.ic) == 1


def test_search_cycle_refusals(spark):
    from datafusion_federation_spark.sqlfront import SqlParseError
    eng = _engine(spark)
    cases = [
        # BY column not an output
        ("WITH RECURSIVE w(n) AS (SELECT 0 UNION ALL "
         "SELECT n + 1 FROM w WHERE n < 3) CYCLE zz SET ic USING p "
         "SELECT n FROM w", "not an output"),
        # SET collides with an output column
        ("WITH RECURSIVE w(n) AS (SELECT 0 UNION ALL "
         "SELECT n + 1 FROM w WHERE n < 3) CYCLE n SET n USING p "
         "SELECT n FROM w", "collides"),
        # non-recursive CTE
        ("WITH RECURSIVE w(n) AS (SELECT 0) CYCLE n SET ic USING p "
         "SELECT n FROM w", "actually recurse"),
    ]
    for sql, msg in cases:
        with pytest.raises(SqlParseError, match=msg):
            eng.sql_plan(sql)


def test_cycle_base_stays_federatable(duckdb_engine):
    # the appended SparkCol columns refuse to unparse, so a fully
    # remote BASE degrades to local compile of the root projection
    # while the scan beneath it still claims
    from datafusion_federation_spark.federation import federate
    from datafusion_federation_spark.plans.nodes import (
        RecursiveCTE, RemoteQueryNode, walk_plan)
    eng, _ex = duckdb_engine
    plan = eng.sql_plan("""
WITH RECURSIVE t(k) AS (
  SELECT c_custkey FROM customer WHERE c_custkey < 3
  UNION ALL SELECT (k * 7 + 3) % 50 FROM t
) CYCLE k SET ic USING p
SELECT CAST(COUNT(*) AS BIGINT) AS c FROM t""").plan
    fed = federate(plan)
    cte = next(n for n in walk_plan(fed) if isinstance(n, RecursiveCTE))
    assert any(isinstance(n, RemoteQueryNode) for n in walk_plan(cte.base))
    rows = eng.execute(fed).collect()
    assert rows[0].c >= 3


# ---------------------------------------------------------------------------
# r9: SEARCH/CYCLE under UNION (distinct) — graduated from the r8 refusal.
# Postgres semantics: distinctness on USER columns only (rewriteSearchCycle
# keeps appended columns out of the duplicate elimination); first-seen row
# wins, within-round ties -> minimal appended tuple.
# ---------------------------------------------------------------------------

def test_cycle_union_distinct_first_seen_min_path(spark):
    eng = _engine(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2), (1, 5), (5, 1),
         (2, 4)],                       # 4 reachable at depth 3 two ways
        "src INT, dst INT")
    eng.register_local_df("edges", edges)
    rows = eng.sql("""
WITH RECURSIVE walk(u) AS (
  SELECT 1 AS u
  UNION
  SELECT e.dst FROM walk w JOIN edges e ON e.src = w.u
) CYCLE u SET ic USING p
SELECT u, ic, p FROM walk""").collect()
    got = {r.u: (r.ic, list(r.p)) for r in rows}
    # first-seen depth = BFS level; path = lexicographically-minimal
    # shortest path; marks all FALSE (a marked row's user tuple is by
    # definition already accumulated, so it never survives the dedup)
    assert got == {
        1: (False, [1]),
        2: (False, [1, 2]),
        5: (False, [1, 5]),
        3: (False, [1, 2, 3]),
        4: (False, [1, 2, 4]),          # min([1,2,4], [1,2,3,4] is longer)
    }
    assert len(rows) == 5               # user-column dedup, no dup paths


def test_cycle_union_distinct_dedups_within_round(spark):
    # two same-round paths to one node: the minimal path must win
    eng = _engine(spark)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 9), (3, 9)], "src INT, dst INT")
    eng.register_local_df("edges", edges)
    rows = eng.sql("""
WITH RECURSIVE walk(u) AS (
  SELECT 1 AS u
  UNION
  SELECT e.dst FROM walk w JOIN edges e ON e.src = w.u
) CYCLE u SET ic USING p
SELECT u, p FROM walk""").collect()
    got = {r.u: list(r.p) for r in rows}
    assert got[9] == [1, 2, 9], "within-round tie must take min path"


def test_search_bfs_union_distinct(spark):
    # SEARCH under distinct rides the same dedup_cols machinery:
    # first-seen level per node
    eng = _engine(spark)
    rows = eng.sql("""
WITH RECURSIVE r(n) AS (
  SELECT 0 AS n
  UNION
  SELECT (n + 3) % 5 FROM r
) SEARCH BREADTH FIRST BY n SET o
SELECT n, o.level AS lvl FROM r""").collect()
    got = {r.n: r.lvl for r in rows}
    assert got == {0: 0, 3: 1, 1: 2, 4: 3, 2: 4}


def test_plain_union_distinct_unaffected(spark):
    # no SEARCH/CYCLE clause: dedup stays on ALL columns
    eng = _engine(spark)
    rows = eng.sql("""
WITH RECURSIVE r(n, tag) AS (
  SELECT 0, 'a'
  UNION
  SELECT (n + 2) % 4, 'a' FROM r
)
SELECT n, tag FROM r""").collect()
    assert sorted(r.n for r in rows) == [0, 2]


def test_cycle_custom_mark_values(spark):
    """r9: CYCLE c SET m TO v DEFAULT dv (graduated from the parse
    refusal) — Postgres 14 custom constant marks; marked rows carry
    the TO value and never recurse."""
    eng = _engine(spark)
    rows = eng.sql("""
WITH RECURSIVE w(n) AS (
  SELECT 0 AS n UNION ALL SELECT (n + 3) % 5 FROM w
) CYCLE n SET flag TO 'Y' DEFAULT 'N' USING p
SELECT n, flag FROM w""").collect()
    assert len(rows) == 6                     # 5 states + marked repeat
    marks = sorted(r.flag for r in rows)
    assert marks == ["N", "N", "N", "N", "N", "Y"]


def test_cycle_custom_numeric_marks(spark):
    eng = _engine(spark)
    rows = eng.sql("""
WITH RECURSIVE w(n) AS (
  SELECT 0 AS n UNION ALL SELECT (n + 2) % 4 FROM w
) CYCLE n SET flag TO 1 DEFAULT 0 USING p
SELECT n, flag FROM w""").collect()
    assert sorted((r.n, r.flag) for r in rows) == \
        [(0, 0), (0, 1), (2, 0)]


def test_cycle_custom_mark_validation(spark):
    from datafusion_federation_spark.sqlfront import SqlParseError
    eng = _engine(spark)
    for bad in ("TO 'Y' DEFAULT 'Y'",        # not distinct
                "TO 1 DEFAULT 'N'",          # mixed types
                "TO n DEFAULT 0"):           # not a constant
        with pytest.raises(SqlParseError):
            eng.sql_plan(
                "WITH RECURSIVE w(n) AS (SELECT 0 UNION ALL "
                "SELECT (n+1)%3 FROM w) "
                f"CYCLE n SET m {bad} USING p SELECT n FROM w")


def test_fixpoint_values_invariant_to_broadcast_cap(spark):
    """r11 (VERDICT r10 Next #7 review): the width-aware broadcast
    cap must be VALUE-NEUTRAL — the min(struct) first-seen
    representative under SEARCH/CYCLE dedup is identical whether the
    working table broadcasts every round (cap huge) or never (cap 0);
    only the join strategy may differ."""
    from datafusion_federation_spark.compiler import Compiler
    q = """
WITH RECURSIVE walk(u) AS (
  SELECT 0 AS u
  UNION
  SELECT (w.u * 2 + d) % 23 FROM walk w
  CROSS JOIN (SELECT 1 AS d UNION ALL SELECT 3 AS d) s
) CYCLE u SET ic USING p
SELECT u, ic, CAST(SIZE(p) AS BIGINT) AS depth FROM walk
ORDER BY u"""
    orig = Compiler._fixpoint_bcast_cap
    results = {}
    try:
        for label, capfn in [("never", staticmethod(
                                  lambda schema, it: 0)),
                             ("always", staticmethod(
                                  lambda schema, it: 1 << 60))]:
            Compiler._fixpoint_bcast_cap = capfn
            eng = _engine(spark)
            results[label] = [tuple(r) for r in eng.sql(q).collect()]
    finally:
        Compiler._fixpoint_bcast_cap = orig
    assert results["never"] == results["always"]
    assert len(results["never"]) == 23
