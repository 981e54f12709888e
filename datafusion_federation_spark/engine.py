"""FederationEngine — the user-facing session object.

The reference wires its pieces into a DataFusion SessionState
(default_session_state, src/lib.rs:25-54: federation rule inserted right
after scalar-subquery decorrelation; FederatedQueryPlanner for physical
planning). Our analog: an engine owning a SparkSession + FederatedCatalog,
a fluent plan builder, the federation pass, and the Spark compiler.

Query lifecycle (SURVEY.md §3):
  build plan (builder or engine.sql) -> federate(plan) -> compile:
  RemoteQueryNode -> executor.execute(sql) + schema cast; local residue ->
  DataFrame ops (Catalyst optimizes/executes).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from .compiler import Compiler
from .expressions import (
    AggFunc, Alias, Col, Cube, Expr, GroupingSets, Rollup, SortKey, Star,
    _wrap, col, lit,
)
from .federation import federate
from .plans.nodes import (
    Aggregate, Distinct, Filter, Join, Limit, Plan, Project, RemoteQueryNode,
    Scan, SetOp, Sort, SubqueryAlias, Union, Window, walk_plan,
)
from .sources.catalog import FederatedCatalog
from .sources.provider import SQLProvider


class FederationEngine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.catalog = FederatedCatalog(spark)
        self.compiler = Compiler(spark)

    # -- registration ------------------------------------------------------
    def _data_changed(self) -> None:
        """Invalidate size-dependent compile caches (r12, ADVICE r11
        #1): the theta-BNL probe memoizes a table's small-enough
        verdict per structural plan, valid only while the underlying
        data is immutable. Every path that can change what a name
        resolves to — registration, discovery, inserts — clears it so
        a table that grows past the gate re-probes instead of
        broadcasting an oversized inner (and a shrunk one stops
        refusing)."""
        self.compiler._bnl_gate_cache.clear()

    def register_local_parquet(self, name: str, path: str):
        self._data_changed()
        return self.catalog.register_local_parquet(name, path)

    def register_local_df(self, name: str, df):
        self._data_changed()
        return self.catalog.register_local_df(name, df)

    def register_local_csv(self, name: str, path: str, **options):
        self._data_changed()
        return self.catalog.register_local_csv(name, path, **options)

    def register_local_json(self, name: str, path: str, **options):
        self._data_changed()
        return self.catalog.register_local_json(name, path, **options)

    def register_local_orc(self, name: str, path: str):
        self._data_changed()
        return self.catalog.register_local_orc(name, path)

    def register_remote(self, provider: SQLProvider, local_name: str,
                        remote_name: Optional[str] = None, schema=None):
        self._data_changed()
        return self.catalog.register_remote(provider, local_name,
                                            remote_name, schema)

    def discover(self, provider: SQLProvider, prefix: str = ""):
        self._data_changed()
        return self.catalog.discover(provider, prefix)

    # -- plan building -----------------------------------------------------
    def table(self, name: str) -> "PlanBuilder":
        return PlanBuilder(self, Scan(self.catalog.table(name)))

    def sql(self, query: str, params: Optional[dict] = None) -> DataFrame:
        """SQL front door with FULL federation: the query is parsed into
        plan IR (sqlfront covers the §2C surface), so single-provider
        subtrees collapse into one remote SQL exactly like the builder
        API — the reference's ctx.sql entry point (SURVEY.md §3).
        Constructs outside the parser's surface fall back to Spark's
        parser over per-table federated views (per-table pushdown only).
        """
        from .dialects import UnsupportedUnparse
        from .sqlfront import SqlParseError, parse_sql, tokenize
        try:
            t0 = tokenize(query)[:1]
        except (SqlParseError, ValueError):
            t0 = []
        if t0 and t0[0][0] == "id" and t0[0][1].upper() == "INSERT":
            return self._sql_insert(query)
        try:
            plan = parse_sql(query, self.catalog.table)
        except (SqlParseError, KeyError, UnsupportedUnparse):
            # UnsupportedUnparse escaping the parser means some internal
            # canonicalization hit a construct no dialect spells — the
            # query may still be locally executable, so degrade to the
            # per-table-view path rather than hard-error (ADVICE r7).
            return self._sql_via_views(query, params)
        return self.execute(plan, params=params)

    def sql_plan(self, query: str) -> "PlanBuilder":
        """Parse SQL into a PlanBuilder (inspect/extend/explain before
        executing)."""
        from .sqlfront import parse_sql
        return PlanBuilder(self, parse_sql(query, self.catalog.table))

    def _sql_via_views(self, query: str,
                       params: Optional[dict] = None) -> DataFrame:
        """Fallback: register catalog tables as Spark views (local
        parquet directly; remote tables as whole-table federated reads)
        and let Spark's parser/Catalyst run the query. Only tables whose
        names appear in the query text are registered — registering a
        remote view materializes the whole table, so unreferenced
        tables must not be touched. ``params`` flow to spark.sql(args=)
        (named :param markers)."""
        # identifier tokens only: a table name inside a string literal
        # or comment must NOT trigger registration (the tokenizer strips
        # comments and folds quoted strings into non-id tokens). Queries
        # the tokenizer cannot lex (e.g. :param markers, $$ quoting)
        # fall back to the permissive word scan — over-registration is
        # lazy-cost only, never wrong results.
        from .sqlfront import tokenize
        try:
            toks = tokenize(query)
            words = {t[1].lower() for t in toks if t[0] == "id"}
            # Spark's IDENTIFIER('name') references a table via a STRING
            # token — include those so the fallback still registers them
            for j, tok in enumerate(toks):
                if (tok[0] == "id" and tok[1].upper() == "IDENTIFIER"
                        and toks[j + 1:j + 2] == [("op", "(")]
                        and j + 2 < len(toks) and toks[j + 2][0] == "str"):
                    words.add(toks[j + 2][1].lower())
        except ValueError:
            import re as _re
            words = {w.lower()
                     for w in _re.findall(r"[A-Za-z_][A-Za-z_0-9]*", query)}
        for name in self.catalog.tables():
            if name.lower() not in words:
                continue
            h = self.catalog.table(name)
            df = self.compiler._c(federate(Scan(h)))
            df.createOrReplaceTempView(name)
        if params:
            return self.spark.sql(query, args=params)
        return self.spark.sql(query)

    # -- execution ---------------------------------------------------------
    def execute(self, plan: Plan, params: Optional[dict] = None) -> DataFrame:
        """Execute a plan. ``params`` binds Placeholder expressions
        (``$1`` / named) before federation, so bound values reach the
        generated remote SQL as literals."""
        if params:
            from .expressions import bind_placeholders
            bind_placeholders(plan, params)
        return self.compiler.compile(federate(plan))

    def _sql_insert(self, query: str):
        """``INSERT INTO <table> [(cols)] <query>`` front door (r12,
        VERDICT r11 Next #6 — write-back beyond local passthrough).

        Remote target whose source fully claims to the SAME provider:
        the SELECT unparses to the remote dialect and the whole
        INSERT ... SELECT executes REMOTELY via the executor's
        execute_statement hook — one round-trip, zero data through
        Spark (the reference only delegates insert_into to a fallback
        provider, src/table_provider.rs:126-139; this extends it the
        way a SQL engine would). Cross-provider writes refuse loudly —
        silently materializing a 100 TB source through the driver to
        ship it row-by-row is exactly the wrong default; the explicit
        ``insert_into(name, df)`` API is the opt-in for that. Local
        targets compute the source (federating any remote subtrees)
        and append via the existing passthrough. Returns the affected
        row count when the engine reports one (remote path) or None
        (local path)."""
        from .plans.nodes import Project, RemoteQueryNode
        from .sqlfront import parse_insert
        name, cols, plan = parse_insert(query, self.catalog.table)
        h = self.catalog.table(name)
        self._data_changed()        # rows will move: BNL verdicts out
        fed = federate(plan)
        # look through the wrap_projection SELECT-* shell: a fully
        # claimed plan is a RemoteQueryNode, possibly under Project(*)
        core = fed
        while (isinstance(core, Project) and len(core.projections) == 1
               and isinstance(core.projections[0], Star)
               and core.projections[0].table is None
               and not core.projections[0].replace
               and not core.projections[0].exclude):
            core = core.input
        if h.provider is not None and hasattr(h.provider, "executor"):
            remote_sql = None
            if (isinstance(core, RemoteQueryNode)
                    and core.provider is h.provider):
                remote_sql = core.sql
            elif not any(isinstance(x, (Scan, RemoteQueryNode))
                         for x in walk_plan(fed)):
                # scanless literal source (FROM-less SELECT / VALUES-
                # as-UNION): reads nothing anywhere, so it renders
                # directly in the target dialect and ships with the DML
                from .unparser import Unparser
                remote_sql = Unparser(
                    h.provider.executor.dialect).plan_to_sql(plan)
            if remote_sql is None:
                raise NotImplementedError(
                    f"INSERT INTO remote table {name!r}: the source "
                    f"query does not fully claim to the same provider "
                    f"({h.provider.name}) — a cross-provider write "
                    f"would materialize the source through the Spark "
                    f"driver; compute it explicitly and use "
                    f"engine.insert_into(name, df)")
            d = h.provider.dialect
            tbl = (h.remote.ref.to_sql(d) if h.remote is not None
                   else d.quote_table(name))
            collist = ("" if not cols
                       else " (" + ", ".join(d.quote(c) for c in cols)
                       + ")")
            stmt = f"INSERT INTO {tbl}{collist} {remote_sql}"
            return h.provider.executor.execute_statement(
                self.spark, stmt)
        # local target: compute the source (remote subtrees still
        # federate) and append through the passthrough path
        df = self.compiler.compile(fed)
        if cols:
            df = df.toDF(*cols)
        return self.insert_into(name, df)

    def insert_into(self, table_name: str, df: DataFrame,
                    mode: str = "append"):
        """INSERT INTO passthrough (reference delegates to the fallback
        provider, src/table_provider.rs:126-139): remote tables go
        through the executor's insert hook; local parquet tables append
        to their path."""
        self._data_changed()     # rows added: stale BNL verdicts out
        h = self.catalog.table(table_name)
        if h.provider is not None and hasattr(h.provider, "executor"):
            ref = h.remote.ref if h.remote is not None else table_name
            return h.provider.executor.insert(self.spark, df, ref, mode)
        if h.fallback_path is not None:
            df.write.mode(mode) \
                .format(getattr(h, "fallback_format", "parquet")) \
                .save(h.fallback_path)
            return None
        raise NotImplementedError(
            f"table {table_name!r} supports no insert path")

    def explain(self, plan: Plan, analyze: bool = False) -> str:
        """Staged explain like the reference's EXPLAIN output
        (src/sql/mod.rs:303-368): which subtrees federated, the base and
        rewritten SQL per federated node, and Spark's physical plan for
        the residue. ``analyze=True`` also executes the plan and reports
        row count + wall time (AnalyzeExec analog; the Analyze wrapper
        itself is never federated — src/optimizer/mod.rs:194-209)."""
        from .plans.nodes import Analyze
        if isinstance(plan, Analyze):
            plan, analyze = plan.input, True
        fed = federate(plan)
        lines = ["== Federated logical plan =="]
        lines += _render_plan(fed)
        for n in walk_plan(fed):
            if isinstance(n, RemoteQueryNode):
                lines.append(f"-- federated on {n.provider!r}")
                if n.base_sql and n.base_sql != n.sql:
                    lines.append(f"   base_sql      = {n.base_sql}")
                lines.append(f"   rewritten_sql = {n.sql}")
        df = self.compiler.compile(fed)
        lines.append("== Spark physical plan (local residue) ==")
        lines.append(df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted")))
        if analyze:
            import time as _time
            t0 = _time.time()
            n = df.count()
            lines.append("== Analyze ==")
            lines.append(f"rows: {n}, elapsed: {_time.time() - t0:.3f}s")
        return "\n".join(lines)


def _render_plan(p: Plan, depth: int = 0):
    pad = "  " * depth
    if isinstance(p, RemoteQueryNode):
        yield f"{pad}Federated[{p.provider.name}]"
        return
    label = type(p).__name__
    if isinstance(p, Scan):
        label += f"({p.table.local_name})"
    yield pad + label
    for i in p.inputs():
        yield from _render_plan(i, depth + 1)


class PlanBuilder:
    """Fluent builder over plan IR (LogicalPlanBuilder analog —
    the reference exercises scan().project().build() at
    src/sql/analyzer.rs:715-738)."""

    def __init__(self, engine: FederationEngine, plan: Plan):
        self._engine = engine
        self._plan = plan

    def _next(self, plan: Plan) -> "PlanBuilder":
        return PlanBuilder(self._engine, plan)

    # -- relational verbs ---------------------------------------------------
    def select(self, *exprs) -> "PlanBuilder":
        exprs = [col(e) if isinstance(e, str) else e for e in exprs]
        return self._next(Project(self._plan, exprs))

    def filter(self, predicate: Expr) -> "PlanBuilder":
        return self._next(Filter(self._plan, predicate))

    where = filter

    def join(self, other: "PlanBuilder", on=None, how: str = "inner",
             using=None) -> "PlanBuilder":
        return self._next(Join(self._plan, other._plan, how=how,
                               condition=on, using=using))

    def group_by(self, *keys) -> "GroupedBuilder":
        keys = [col(k) if isinstance(k, str) else k for k in keys]
        return GroupedBuilder(self, keys)

    def rollup(self, *keys) -> "GroupedBuilder":
        keys = [col(k) if isinstance(k, str) else k for k in keys]
        return GroupedBuilder(self, [Rollup(keys)])

    def cube(self, *keys) -> "GroupedBuilder":
        keys = [col(k) if isinstance(k, str) else k for k in keys]
        return GroupedBuilder(self, [Cube(keys)])

    def grouping_sets(self, *sets) -> "GroupedBuilder":
        conv = [[col(k) if isinstance(k, str) else k for k in s]
                for s in sets]
        return GroupedBuilder(self, [GroupingSets(conv)])

    def window(self, *window_exprs) -> "PlanBuilder":
        return self._next(Window(self._plan, list(window_exprs)))

    def order_by(self, *keys) -> "PlanBuilder":
        norm = []
        for k in keys:
            if isinstance(k, str):
                norm.append(SortKey(col(k)))
            elif isinstance(k, SortKey):
                norm.append(k)
            else:
                norm.append(SortKey(k))
        return self._next(Sort(self._plan, norm))

    def limit(self, n: int, offset: int = 0) -> "PlanBuilder":
        return self._next(Limit(self._plan, fetch=n, skip=offset))

    def offset(self, n: int) -> "PlanBuilder":
        return self._next(Limit(self._plan, fetch=None, skip=n))

    def union_all(self, *others: "PlanBuilder") -> "PlanBuilder":
        return self._next(Union([self._plan, *[o._plan for o in others]],
                                all=True))

    def union(self, *others: "PlanBuilder") -> "PlanBuilder":
        return self._next(Union([self._plan, *[o._plan for o in others]],
                                all=False))

    def intersect(self, other: "PlanBuilder", all: bool = False):
        return self._next(SetOp(self._plan, other._plan, "INTERSECT", all))

    def except_(self, other: "PlanBuilder", all: bool = False):
        return self._next(SetOp(self._plan, other._plan, "EXCEPT", all))

    def distinct(self) -> "PlanBuilder":
        return self._next(Distinct(self._plan))

    def alias(self, name: str) -> "PlanBuilder":
        return self._next(SubqueryAlias(self._plan, name))

    # -- terminal -----------------------------------------------------------
    @property
    def plan(self) -> Plan:
        return self._plan

    def to_df(self) -> DataFrame:
        return self._engine.execute(self._plan)

    def explain(self) -> str:
        return self._engine.explain(self._plan)

    def collect(self):
        return self.to_df().collect()


class GroupedBuilder:
    def __init__(self, parent: PlanBuilder, keys: Sequence[Expr]):
        self._parent = parent
        self._keys = keys

    def agg(self, *aggs, having: Optional[Expr] = None) -> PlanBuilder:
        return self._parent._next(
            Aggregate(self._parent._plan, self._keys, list(aggs),
                      having=having))
