"""Pre-federation filter pushdown (optimizer.py): the reference gets
this from DataFusion's standard passes running before the federation
rule; without it a WHERE above a cross-provider join pulls whole remote
tables."""

from __future__ import annotations

import duckdb
import pytest

from datafusion_federation_spark.expressions import (
    BinaryOp, Col, Lit, col, lit)
from datafusion_federation_spark.federation import federate
from datafusion_federation_spark.optimizer import push_filters
from datafusion_federation_spark.plans.nodes import (
    Filter, Join, Project, RemoteQueryNode, Scan, SubqueryAlias,
    walk_plan)
from tests.conftest import TESTDATA
from tests.test_unparser_goldens import h as mk_handle


def _scan(name, cols):
    from pyspark.sql.types import LongType, StructField, StructType
    handle = mk_handle(name)
    handle.schema = StructType(
        [StructField(c, LongType()) for c in cols])
    return Scan(handle)


def test_conjunct_splits_to_both_join_sides():
    a = _scan("ta", ["k", "x"])
    b = _scan("tb", ["k2", "y"])
    j = Join(a, b, "inner", BinaryOp("=", Col("k"), Col("k2")))
    pred = BinaryOp("AND",
                    BinaryOp(">", Col("x"), Lit(1)),
                    BinaryOp("<", Col("y"), Lit(9)))
    out = push_filters(Filter(j, pred))
    assert isinstance(out, Join), "both conjuncts must leave the top"
    assert isinstance(out.left, Filter) and isinstance(out.right, Filter)


def test_ambiguous_name_stays_above():
    a = _scan("ta", ["k", "x"])
    b = _scan("tb", ["k", "y"])          # k exists on BOTH sides
    j = Join(a, b, "cross")
    out = push_filters(Filter(j, BinaryOp(">", Col("k"), Lit(1))))
    assert isinstance(out, Filter), "ambiguous column must not move"


def test_left_join_predicate_never_pushes():
    a = _scan("ta", ["k", "x"])
    b = _scan("tb", ["k2", "y"])
    j = Join(a, b, "left", BinaryOp("=", Col("k"), Col("k2")))
    out = push_filters(Filter(j, BinaryOp(">", Col("y"), Lit(0))))
    assert isinstance(out, Filter), \
        "filtering the null-supplying side below a LEFT join would " \
        "change null-extension semantics"


def test_qualified_ref_pushes_through_alias():
    a = SubqueryAlias(_scan("ta", ["k", "x"]), "aa")
    b = _scan("tb", ["k2", "y"])
    j = Join(a, b, "inner", BinaryOp("=", Col("k", "aa"), Col("k2")))
    out = push_filters(
        Filter(j, BinaryOp(">", Col("x", "aa"), Lit(5))))
    assert isinstance(out, Join)
    side = out.left
    assert isinstance(side, SubqueryAlias) and \
        isinstance(side.input, Filter), \
        "alias-qualified conjunct must land INSIDE the aliased subtree"


def test_nondeterministic_conjunct_stays():
    from datafusion_federation_spark.expressions import func
    a = _scan("ta", ["k", "x"])
    b = _scan("tb", ["k2", "y"])
    j = Join(a, b, "inner", BinaryOp("=", Col("k"), Col("k2")))
    out = push_filters(
        Filter(j, BinaryOp("<", func("rand"), Lit(0.5))))
    assert isinstance(out, Filter), \
        "rand() filtered before vs after the join differs"


def test_cross_engine_where_rides_into_remote_sql(spark):
    """End to end: SQL-front WHERE above a cross-engine join lands
    inside the owning engine's SQL and results match DuckDB."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLiteExecutor, SQLProvider)

    duck = DuckDBExecutor(name="pushduck", compute_context="pd")
    duck.register_parquet("orders", f"{TESTDATA}/orders.parquet")
    lite = SQLiteExecutor(name="pushlite", compute_context="pd")
    lite.load_rows(
        "prio_dim", "CREATE TABLE prio_dim (prio TEXT, weight INTEGER)",
        [("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3),
         ("4-NOT SPECIFIED", 2), ("5-LOW", 1)])
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(duck), "orders")
    eng.register_remote(SQLProvider(lite), "prio_dim")

    sql = ("SELECT p.weight, COUNT(*) AS n FROM orders o "
           "JOIN prio_dim p ON o.o_orderpriority = p.prio "
           "WHERE o.o_totalprice > 200000 AND p.weight >= 3 "
           "GROUP BY p.weight")
    got = sorted(map(tuple, eng.sql(sql).collect()))
    assert "o_totalprice" in duck.metrics()["last_sql"], \
        "orders-side conjunct must ride inside the DuckDB SQL"
    assert "weight" in lite.metrics()["last_sql"], \
        "dim-side conjunct must ride inside the SQLite SQL"

    conn = duckdb.connect()
    conn.execute(f"CREATE VIEW orders AS SELECT * FROM "
                 f"read_parquet('{TESTDATA}/orders.parquet')")
    conn.execute("CREATE TABLE prio_dim AS SELECT * FROM (VALUES "
                 "('1-URGENT',5),('2-HIGH',4),('3-MEDIUM',3),"
                 "('4-NOT SPECIFIED',2),('5-LOW',1)) v(prio, weight)")
    want = sorted(map(tuple, conn.execute(sql).fetchall()))
    assert got == want


def test_no_push_below_window_projection():
    """Filtering before a window function changes its row set (QUALIFY
    evaluation order) — the conjunct must stay above."""
    from datafusion_federation_spark.expressions import (
        SortKey, WindowFunc, func)
    inner = _scan("ta", ["k", "x"])
    proj = Project(inner, [
        Col("k"), Col("x"),
        WindowFunc(func("row_number"),
                   order_by=[SortKey(Col("x"))]).alias("rk")])
    out = push_filters(Filter(proj, BinaryOp(">", Col("x"), Lit(5))))
    assert isinstance(out, Filter), \
        "push below a window projection changes window results"


def test_column_pruning_reaches_remote_scan(spark):
    """A cross-engine join selecting 2 of orders' 6 columns must ship a
    2-column remote SQL, not SELECT * (the brief's 'scan that reads all
    columns for a 2-column projection is wrong')."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLiteExecutor, SQLProvider)

    duck = DuckDBExecutor(name="pruneduck", compute_context="pr")
    duck.register_parquet("orders", f"{TESTDATA}/orders.parquet")
    lite = SQLiteExecutor(name="prunelite", compute_context="pr")
    lite.load_rows(
        "prio_dim2", "CREATE TABLE prio_dim2 (prio TEXT, weight INTEGER)",
        [("1-URGENT", 5), ("5-LOW", 1)])
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(duck), "orders")
    eng.register_remote(SQLProvider(lite), "prio_dim2")

    df = eng.sql(
        "SELECT p.weight, COUNT(*) AS n FROM orders o "
        "JOIN prio_dim2 p ON o.o_orderpriority = p.prio "
        "WHERE o.o_totalprice > 100000 GROUP BY p.weight")
    assert df.count() >= 1
    sql = duck.metrics()["last_sql"]
    assert "o_totalprice" in sql and "o_orderpriority" in sql
    for unneeded in ("o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderstatus"):
        assert unneeded not in sql, \
            f"{unneeded} must be pruned from the remote scan: {sql}"


def test_pruned_plan_results_unchanged(spark):
    """Prune + push must be result-invariant on a local plan."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.optimizer import (
        prune_scans, push_filters)

    eng = FederationEngine(spark)
    eng.register_local_parquet("lineitem", f"{TESTDATA}/lineitem.parquet")
    eng.register_local_parquet("orders", f"{TESTDATA}/orders.parquet")
    sql = ("SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS q "
           "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
           "WHERE o_totalprice > 150000 AND l_discount < 0.05 "
           "GROUP BY l_returnflag")
    raw = eng.sql_plan(sql).plan
    plain = {tuple(r) for r in eng.compiler.compile(raw).collect()}
    optimized = prune_scans(push_filters(eng.sql_plan(sql).plan))
    opt = {tuple(r) for r in eng.compiler.compile(optimized).collect()}
    assert plain == opt


def test_pruned_aliased_scan_keeps_projection_in_remote_sql(spark):
    """A pruned scan used as an ALIASED relation (no pushed filter) must
    render its column list — dropping it made the remote return 6
    columns against a 1-column expected schema (review r3 crash)."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLiteExecutor, SQLProvider)

    duck = DuckDBExecutor(name="aliasduck", compute_context="ap")
    duck.register_parquet("orders", f"{TESTDATA}/orders.parquet")
    lite = SQLiteExecutor(name="aliaslite", compute_context="ap")
    lite.load_rows(
        "prio_dim3", "CREATE TABLE prio_dim3 (prio TEXT, weight INTEGER)",
        [("1-URGENT", 5), ("5-LOW", 1)])
    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(duck), "orders")
    eng.register_remote(SQLProvider(lite), "prio_dim3")

    # no WHERE on orders -> pruned scan flows through SubqueryAlias
    df = eng.sql("SELECT p.weight, COUNT(*) AS n FROM orders o "
                 "JOIN prio_dim3 p ON o.o_orderpriority = p.prio "
                 "GROUP BY p.weight")
    assert df.count() >= 1
    sql = duck.metrics()["last_sql"]
    assert "o_orderpriority" in sql and "o_orderkey" not in sql


def test_distinct_blocks_pruning():
    """DISTINCT dedupes whole rows; pruning below it changes
    multiplicities (review r3)."""
    from datafusion_federation_spark.plans.nodes import Distinct
    a = _scan("ta", ["a", "b"])
    out = push_filters(Project(Distinct(a), [Col("a")]))
    from datafusion_federation_spark.optimizer import prune_scans
    pruned = prune_scans(Project(Distinct(a), [Col("a")]))
    scans = [n for n in walk_plan(pruned) if isinstance(n, Scan)]
    assert scans[0].projection is None, \
        "scan below DISTINCT must keep all columns"


def test_using_join_prunes_with_shared_key():
    from datafusion_federation_spark.optimizer import prune_scans
    from datafusion_federation_spark.plans.nodes import Aggregate
    from datafusion_federation_spark.expressions import AggFunc, Alias
    a = _scan("ta", ["k", "x", "junk1"])
    b = _scan("tb", ["k", "y", "junk2"])
    j = Join(a, b, "inner", using=["k"])
    agg = Aggregate(j, [Col("y")],
                    [Alias(AggFunc("sum", [Col("x")]), "s")])
    pruned = prune_scans(agg)
    scans = {n.table.local_name: n.projection
             for n in walk_plan(pruned) if isinstance(n, Scan)}
    assert scans["ta"] == ["k", "x"], scans
    assert scans["tb"] == ["k", "y"], scans


def test_three_way_join_pushes_each_conjunct_to_its_scan():
    # r8 (exposed by q111): _plan_cols answered None for Join, so in a
    # left-deep 3-way join NO conjunct could see through the inner join
    # — every engine got a whole-table read. The pushdown resolver now
    # unions a join's sides (the provenance guard keeps its own
    # stricter resolver).
    from tests.test_unparser_goldens import h as mk_handle
    from datafusion_federation_spark.optimizer import push_filters
    from datafusion_federation_spark.plans.nodes import (
        Filter, Join, Scan, walk_plan)
    from datafusion_federation_spark.sqlfront import parse_sql
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType)

    def handle(name, cols):
        h = mk_handle(name)
        h.schema = StructType([StructField(c, LongType(), True)
                               for c in cols])
        return h

    tables = {
        "customer": handle("customer", ["c_custkey", "c_nationkey",
                                        "c_acctbal"]),
        "nation": handle("nation", ["n_nationkey", "n_regionkey"]),
        "region": handle("region", ["r_regionkey", "r_name"]),
    }
    plan = parse_sql(
        "SELECT r_name, COUNT(*) AS n FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE c_acctbal > 1000 AND n_nationkey >= 2 "
        "AND r_regionkey < 4 GROUP BY r_name",
        lambda n: tables[n.split(".")[-1]])
    pushed = push_filters(plan)
    # every conjunct must sit DIRECTLY above its scan now
    scan_filters = {}
    for n in walk_plan(pushed):
        if isinstance(n, Filter) and isinstance(n.input, Scan):
            scan_filters[n.input.table.local_name] = n
    assert set(scan_filters) == {"customer", "nation", "region"}, \
        f"conjuncts not at their scans: {sorted(scan_filters)}"


def test_memo_keys_stay_alive_and_identity_checked():
    """ADVICE r9 (high): push_filters memoizes transient nodes built in
    _push_one; if the memo value were the result alone, a GC'd transient
    key's id could be recycled by a later node which would then get a
    stale hit (an unrelated subtree spliced in, nondeterministically).
    Pin the fix: every memo entry stores the keyed node itself (pinning
    its id for the memo's lifetime) and the key equals that node's id."""
    a = _scan("ta", ["k", "x"])
    b = _scan("tb", ["k2", "y"])
    j = Join(a, b, "inner", BinaryOp("=", Col("k"), Col("k2")))
    pred = BinaryOp("AND",
                    BinaryOp(">", Col("x"), Lit(1)),
                    BinaryOp("<", Col("y"), Lit(9)))
    memo = {}
    out = push_filters(Filter(j, pred), memo)
    assert isinstance(out, Join)
    assert memo, "memo must be populated"
    for key, val in memo.items():
        assert isinstance(val, tuple) and len(val) == 2, \
            "memo values must be (node, result) pairs — the node " \
            "reference is what pins the id"
        node, _res = val
        assert id(node) == key, \
            "memo key must be the id of the stored node"


def test_memo_stale_id_hit_is_rejected():
    """A poisoned memo entry whose stored node is NOT the queried node
    (the address-reuse scenario) must be ignored, not returned."""
    a = _scan("ta", ["k", "x"])
    f = Filter(a, BinaryOp(">", Col("x"), Lit(1)))
    poison = _scan("poison", ["z"])
    memo = {id(f): (poison, poison)}       # stale: stored node != f
    out = push_filters(f, memo)
    assert out is not poison, \
        "identity check must reject a recycled-id memo hit"
    assert isinstance(out, Filter)
