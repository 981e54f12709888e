"""Federation-pass shape tests — port of the reference's end-to-end plan
assertions (/root/reference/datafusion-federation/src/sql/mod.rs:447-869):
which scans end up inside federated nodes, what final SQL each federated
node carries, UNION ALL collapsing into one remote query for a single
provider, the sql_query_rewriter hook firing exactly once, provider
identity = (name, compute_context), and the double-federation guard.

Pure plan-IR tests: no SparkSession needed (claim/unparse never touch
Spark).
"""

from __future__ import annotations

import pytest

from datafusion_federation_spark.expressions import (
    Alias, BinaryOp, Col, OuterRef, Star, agg, col, lit,
)
from datafusion_federation_spark.federation import federate, scan_plan
from datafusion_federation_spark.plans.nodes import (
    Aggregate, Filter, Join, Project, RemoteQueryNode, Scan, Union,
    walk_plan,
)
from datafusion_federation_spark.sources.provider import (
    FederationProvider, SQLExecutor, SQLProvider)
from datafusion_federation_spark.sources.table import RemoteTable, TableHandle


class StubExecutor(SQLExecutor):
    """Unparse-only executor (the reference’s TestExecutor also leaves
    execute() unimplemented — mod.rs:474-508)."""

    dialect = "ansi"

    def __init__(self, name="StubExecutor", compute_context=None):
        self.name = name
        self.compute_context = compute_context


def provider(ctx="a", name="StubExecutor"):
    return SQLProvider(StubExecutor(name=name, compute_context=ctx))


def handle(local, prov, remote=None):
    return TableHandle(local_name=local, provider=prov,
                       remote=RemoteTable.named(remote or local))


def abc_scan(local, prov, remote=None):
    return Scan(handle(local, prov, remote))


def remote_nodes(plan):
    return [n for n in walk_plan(plan) if isinstance(n, RemoteQueryNode)]


def scans_under(node):
    return sorted(s.table.local_name for s in walk_plan(node.plan)
                  if isinstance(s, Scan))


# ---------------------------------------------------------------------------
# basic_sql_federation_test (mod.rs:578-679)
# ---------------------------------------------------------------------------

def test_union_all_mixed_providers_federates_each_branch():
    prov_a = provider(ctx="a")
    prov_b = provider(ctx="b")
    plan = Union([
        Project(abc_scan("table_a1", prov_a), [Star()]),
        Project(abc_scan("table_a2", prov_a), [Star()]),
        Project(abc_scan("table_local_b1", prov_b, "table_b1(1)"), [Star()]),
    ], all=True)
    fed = federate(plan)
    nodes = remote_nodes(fed)
    assert len(nodes) == 3
    fed_scans = sorted(t for n in nodes for t in scans_under(n))
    assert fed_scans == ["table_a1", "table_a2", "table_local_b1"]
    sqls = sorted(n.sql for n in nodes)
    assert sqls == [
        'SELECT * FROM "table_a1"',
        'SELECT * FROM "table_a2"',
        'SELECT * FROM "table_b1"(1) AS "table_local_b1"',
    ]


# ---------------------------------------------------------------------------
# multi_reference_sql_federation_test (mod.rs:681-767): same provider ->
# the whole UNION ALL collapses into ONE remote query
# ---------------------------------------------------------------------------

def test_union_all_single_provider_is_one_remote_query():
    prov = provider(ctx="test")
    plan = Union([
        Project(abc_scan("dftable", prov, "default.table"), [Star()]),
        Project(abc_scan("dfview", prov, "default.Table(1)"), [Star()]),
    ], all=True)
    fed = federate(plan)
    nodes = remote_nodes(fed)
    assert len(nodes) == 1 and fed is nodes[0]
    assert nodes[0].sql == (
        'SELECT * FROM "default"."table" AS "dftable" UNION ALL '
        'SELECT * FROM "default"."Table"(1) AS "dfview"')


# ---------------------------------------------------------------------------
# largest-subtree grouping: join+agg on one provider -> one remote query
# ---------------------------------------------------------------------------

def test_join_agg_one_provider_collapses():
    prov = provider()
    o = abc_scan("orders", prov)
    c = abc_scan("customer", prov)
    j = Join(o, c, condition=BinaryOp("=", Col("o_custkey", "orders"),
                                     Col("c_custkey", "customer")))
    ag = Aggregate(j, [col("c_mktsegment")],
                   [Alias(agg("count", Star()), "n")])
    fed = federate(ag)
    assert isinstance(fed, RemoteQueryNode)
    assert "JOIN" in fed.sql and "GROUP BY" in fed.sql


def test_mixed_plan_federates_only_remote_subtree():
    prov = provider()
    local = Scan(TableHandle(local_name="lineitem", provider=None,
                             fallback_path="/dev/null"))
    remote = abc_scan("orders", prov)
    j = Join(local, remote,
             condition=BinaryOp("=", Col("l_orderkey", "lineitem"),
                                Col("o_orderkey", "orders")))
    fed = federate(j)
    nodes = remote_nodes(fed)
    assert len(nodes) == 1
    assert scans_under(nodes[0]) == ["orders"]
    assert isinstance(fed, Join)   # join itself stays local


# ---------------------------------------------------------------------------
# provider identity (mod.rs compute_context; src/lib.rs:76-90)
# ---------------------------------------------------------------------------

def test_same_name_different_context_not_merged():
    prov1 = provider(ctx="a")
    prov2 = provider(ctx="b")          # same executor name, different ctx
    assert prov1 != prov2
    j = Join(abc_scan("t1", prov1), abc_scan("t2", prov2),
             condition=BinaryOp("=", Col("a", "t1"), Col("a", "t2")))
    fed = federate(j)
    nodes = remote_nodes(fed)
    assert len(nodes) == 2             # two remote queries, not one


def test_same_name_same_context_merged():
    ex = StubExecutor(compute_context="shared")
    prov = SQLProvider(ex)
    j = Join(abc_scan("t1", prov), abc_scan("t2", prov),
             condition=BinaryOp("=", Col("a", "t1"), Col("a", "t2")))
    fed = federate(j)
    assert isinstance(fed, RemoteQueryNode)


# ---------------------------------------------------------------------------
# sql_query_rewriter hook invoked exactly once (mod.rs:820-869)
# ---------------------------------------------------------------------------

def test_sql_query_rewriter_invoked_once():
    calls = []
    suffix = "/* rewritten by sql_query_rewriter */"

    def rewriter(s):
        calls.append(s)
        return f"{s} {suffix}"

    prov = provider(ctx="rewrite")
    t = TableHandle(
        local_name="table_with_rewriter", provider=prov,
        remote=RemoteTable.named("table_with_rewriter",
                                 sql_query_rewriter=rewriter))
    fed = federate(Project(Scan(t), [Star()]))
    assert isinstance(fed, RemoteQueryNode)
    assert fed.sql.endswith(suffix)
    assert len(calls) == 1
    # base_sql keeps the pre-hook SQL for EXPLAIN (mod.rs:303-368)
    assert fed.base_sql == 'SELECT * FROM "table_with_rewriter"'


def test_ast_analyzer_chain_order():
    """Hook order: executor ast_analyzer -> per-table ast_analyzers ->
    per-table sql_query_rewriters (reference mod.rs:207-216,286-301)."""
    order = []

    prov = provider()
    prov.executor.ast_analyzer = (
        lambda s: (order.append("executor_ast"), s)[1])
    t = TableHandle(
        local_name="t1", provider=prov,
        remote=RemoteTable.named(
            "t1",
            ast_analyzer=lambda s: (order.append("table_ast"), s)[1],
            sql_query_rewriter=lambda s: (order.append("rewriter"), s)[1]))
    federate(Project(Scan(t), [Star()]))
    assert order == ["executor_ast", "table_ast", "rewriter"]


# ---------------------------------------------------------------------------
# guards
# ---------------------------------------------------------------------------

def test_double_federation_guard():
    prov = provider()
    fed = federate(Project(abc_scan("t1", prov), [Star()]))
    assert isinstance(fed, RemoteQueryNode)
    # federating again must leave the node untouched, not re-wrap it
    fed2 = federate(fed)
    assert fed2 is fed


def test_outer_ref_forces_local():
    """Correlated outer references keep the containing subtree local;
    federation happens lower (reference optimizer/mod.rs:114-120)."""
    prov = provider()
    inner = Filter(abc_scan("t1", prov),
                   BinaryOp("=", col("a"), OuterRef("b", "outer_t")))
    fed = federate(inner)
    # the Filter stays local: only the scan below it federates
    assert isinstance(fed, Filter)
    assert len(remote_nodes(fed)) == 1


def test_schema_stable_hook_enforced():
    """logical_optimizer hooks must not change the plan schema
    (reference checks this: mod.rs:272-282)."""
    prov = provider()

    def bad_optimizer(plan):
        return Project(plan.input, [col("only_one")])

    t = TableHandle(
        local_name="t1", provider=prov,
        remote=RemoteTable.named("t1", logical_optimizer=bad_optimizer))
    with pytest.raises(ValueError, match="schema"):
        federate(Project(Scan(t), [col("a"), col("b")]))


def test_nonfederatable_provider_stays_local():
    plan = Project(Scan(TableHandle(local_name="t", provider=None,
                                    fallback_path="/dev/null")), [Star()])
    fed = federate(plan)
    assert not remote_nodes(fed)


def test_scalar_subquery_federates_independently():
    """A local plan whose ScalarSubquery reads a remote table: the
    subquery federates as its own root (optimize_plan_exprs analog,
    reference optimizer/mod.rs:266-305)."""
    from datafusion_federation_spark.expressions import ScalarSubquery, agg
    prov = provider()
    local = Scan(TableHandle(local_name="lineitem", provider=None,
                             fallback_path="/dev/null"))
    sub = Aggregate(abc_scan("orders", prov), [],
                    [Alias(agg("avg", col("a")), "avg_a")])
    sq = ScalarSubquery(sub)
    plan = Filter(local, BinaryOp(">", col("x"), sq))
    fed = federate(plan)
    assert isinstance(fed, Filter)            # outer plan stays local
    assert isinstance(sq.plan, RemoteQueryNode), \
        "the subquery plan must have federated independently"
    assert "AVG" in sq.plan.sql


def test_set_comparison_subquery_federates_independently():
    from datafusion_federation_spark.expressions import SetComparison
    prov = provider()
    local = Scan(TableHandle(local_name="lineitem", provider=None,
                             fallback_path="/dev/null"))
    sub = Project(abc_scan("orders", prov), [col("a")])
    sc = SetComparison(col("x"), ">", "ANY", sub)
    plan = Filter(local, sc)
    fed = federate(plan)
    assert isinstance(fed, Filter)
    assert isinstance(sc.plan, RemoteQueryNode)


def test_exists_subquery_plan_federates_inside():
    """The EXISTS predicate stays local, but the remote subtree INSIDE
    it must federate (else it degrades to a whole-table remote read)."""
    from datafusion_federation_spark.expressions import Exists, lit
    prov = provider()
    local = Scan(TableHandle(local_name="lineitem", provider=None,
                             fallback_path="/dev/null"))
    sub = Project(Filter(abc_scan("orders", prov),
                         BinaryOp(">", col("o_totalprice"), lit(100))),
                  [col("o_orderkey")])
    ex = Exists(sub)
    plan = Filter(local, ex)
    fed = federate(plan)
    assert isinstance(fed, Filter)
    assert isinstance(ex.plan, RemoteQueryNode)
    assert "o_totalprice" in ex.plan.sql      # the filter pushed down


def test_table_hooks_reach_subquery_embedded_tables(spark):
    """A table appearing ONLY inside a scalar subquery of a claimed plan
    must still contribute its sql_query_rewriter/ast hooks (review r3:
    walk_plan never descends into expression-embedded plans)."""
    from datafusion_federation_spark.engine import FederationEngine
    from datafusion_federation_spark.expressions import (
        ScalarSubquery, agg, col, lit)
    from datafusion_federation_spark.sources.provider import (
        DuckDBExecutor, SQLProvider)
    from tests.conftest import TESTDATA

    hits = []

    def rewriter(sql):
        hits.append(sql)
        return sql

    ex = DuckDBExecutor(name="hookduck", compute_context="subqhook")
    for t in ("orders", "customer"):
        ex.register_parquet(t, f"{TESTDATA}/{t}.parquet")
    eng = FederationEngine(spark)
    prov = SQLProvider(ex)
    eng.register_remote(prov, "orders")
    eng.register_remote(prov, "customer")
    eng.catalog.table("customer").remote.sql_query_rewriter = rewriter

    sub = eng.table("customer").group_by().agg(
        agg("max", col("c_acctbal")).alias("m"))
    b = (eng.table("orders")
         .filter(col("o_totalprice") > ScalarSubquery(sub.plan))
         .group_by().agg(agg("count").alias("n")))
    n = b.to_df().collect()[0]["n"]
    assert n >= 0
    assert hits, ("customer's sql_query_rewriter must run for the "
                  "claimed plan embedding it in a subquery")
    assert "c_acctbal" in hits[0]
