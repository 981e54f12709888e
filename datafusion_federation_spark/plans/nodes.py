"""Logical plan IR.

Mirrors the plan-level surface the reference can traverse and relay
(SURVEY.md §2C "plan-level operators"; reference evidence in
datafusion-federation/src/sql/analyzer.rs and src/optimizer/mod.rs).
The federation pass (``..federation``) walks these nodes; the unparser
(``..unparser``) renders a single-provider subtree to remote SQL; the
compiler (``..compiler``) executes whatever stays local as ordinary
PySpark DataFrame operations so Catalyst owns join selection, pushdown,
pruning, codegen and shuffle for the local residue (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

from ..expressions import Expr, SortKey


class Plan:
    """Base logical plan node."""

    def inputs(self) -> Sequence["Plan"]:
        return ()

    def exprs(self) -> Sequence[Expr]:
        """Expressions attached to this node (scan_plan_exprs analog)."""
        return ()

    def with_inputs(self, new_inputs: Sequence["Plan"]) -> "Plan":
        """Structural copy with replaced inputs (TreeNode rewrite analog)."""
        raise NotImplementedError(type(self).__name__)


@dataclass(eq=False)
class VerbatimSQLPlan(Plan):
    """Unparse-only leaf carrying pre-rendered remote SQL (r13,
    VERDICT r12 Next #3): a DML predicate subquery whose plan already
    claimed wholly to the target's provider is swapped for this node,
    so the enclosing expression's to_sql splices the claimed SQL
    verbatim into the one remote statement. Never enters federate()
    or the compiler — DML statements ship as strings, not plans."""

    sql: str

    def with_inputs(self, new_inputs):
        assert not new_inputs
        return self


@dataclass(eq=False)
class Scan(Plan):
    """Table scan. ``table`` is a registry TableHandle carrying the local
    name, the owning provider, the remote table reference and the Spark
    schema (FederatedTableProviderAdaptor analog, reference
    src/table_provider.rs:21-124)."""

    table: Any                       # sources.table.TableHandle
    projection: Optional[Sequence[str]] = None

    def with_inputs(self, new_inputs):
        assert not new_inputs
        return self


@dataclass(eq=False)
class Project(Plan):
    input: Plan
    projections: Sequence[Expr]

    def inputs(self): return (self.input,)
    def exprs(self): return tuple(self.projections)

    def with_inputs(self, new_inputs):
        return Project(new_inputs[0], self.projections)


@dataclass(eq=False)
class Filter(Plan):
    input: Plan
    predicate: Expr

    def inputs(self): return (self.input,)
    def exprs(self): return (self.predicate,)

    def with_inputs(self, new_inputs):
        return Filter(new_inputs[0], self.predicate)


@dataclass(eq=False)
class Join(Plan):
    """how: inner | left | right | full | cross | semi | anti."""

    left: Plan
    right: Plan
    how: str = "inner"
    condition: Optional[Expr] = None     # ON expr
    using: Optional[Sequence[str]] = None  # USING (cols)

    def inputs(self): return (self.left, self.right)

    def exprs(self):
        return (self.condition,) if self.condition is not None else ()

    def with_inputs(self, new_inputs):
        return Join(new_inputs[0], new_inputs[1], self.how,
                    self.condition, self.using)


@dataclass(eq=False)
class AsofJoin(Plan):
    """Event-time as-of join: for each left row, the single right row
    nearest in time under the ON condition's one inequality
    (``l.ts >= r.ts`` -> backward, ``<=`` -> forward), matched on the
    condition's equality conjuncts. how: inner | left.

    Locally this compiles to operators/temporal.asof_join (union + one
    keyed window — no join node); federated, dialects with native ASOF
    (DuckDB) render it verbatim and every other dialect refuses the
    claim so the plan stays local (dialects.supports_asof_join).

    Output contract (ENGINE semantics, both arms must be written to
    it): left columns under their own names; right timestamp as
    ``<ts>_right``; right payload unqualified (suffixed on collision);
    right KEY columns not re-exposed. ``SELECT *`` over an ASOF JOIN is
    REFUSED (the SQL expansion and this contract disagree — list
    columns explicitly); qualified right-side refs (``b.x``) resolve
    only when a native-ASOF engine executes the subtree — reference
    right columns unqualified for arm-independent SQL.
    """

    left: Plan
    right: Plan
    how: str = "inner"   # same default as Join / DuckDB's ASOF JOIN
    condition: Optional[Expr] = None

    def inputs(self): return (self.left, self.right)

    def exprs(self):
        return (self.condition,) if self.condition is not None else ()

    def with_inputs(self, new_inputs):
        return AsofJoin(new_inputs[0], new_inputs[1], self.how,
                        self.condition)


@dataclass(eq=False)
class Aggregate(Plan):
    """group_by may contain plain exprs or Rollup/Cube/GroupingSets."""

    input: Plan
    group_by: Sequence[Expr]
    aggregates: Sequence[Expr]           # Alias(AggFunc) entries
    having: Optional[Expr] = None

    def inputs(self): return (self.input,)

    def exprs(self):
        out = list(self.group_by) + list(self.aggregates)
        if self.having is not None:
            out.append(self.having)
        return tuple(out)

    def with_inputs(self, new_inputs):
        return Aggregate(new_inputs[0], self.group_by, self.aggregates,
                         self.having)


@dataclass(eq=False)
class Window(Plan):
    """Appends window-function columns (Alias(WindowFunc) entries)."""

    input: Plan
    window_exprs: Sequence[Expr]

    def inputs(self): return (self.input,)
    def exprs(self): return tuple(self.window_exprs)

    def with_inputs(self, new_inputs):
        return Window(new_inputs[0], self.window_exprs)


@dataclass(eq=False)
class Sort(Plan):
    input: Plan
    keys: Sequence[SortKey]

    def inputs(self): return (self.input,)
    def exprs(self): return tuple(self.keys)

    def with_inputs(self, new_inputs):
        return Sort(new_inputs[0], self.keys)


@dataclass(eq=False)
class Limit(Plan):
    """LIMIT fetch OFFSET skip; both survive rewrites INCLUDING zero
    values — LIMIT 0 / OFFSET 0 must render, not vanish (the reference
    regression-fixed this: src/sql/analyzer.rs:73-94, CHANGELOG #101).
    ``skip=None`` means no OFFSET clause at all."""

    input: Plan
    fetch: Optional[int] = None
    skip: Optional[int] = None
    #: ANSI `FETCH FIRST n ROWS WITH TIES`: peers of the boundary row
    #: (under the governing ORDER BY) are kept too. Requires a Sort
    #: beneath; lowered by the compiler via a boundary-key probe, or
    #: unparsed natively on engines that spell it (DuckDB/Postgres).
    with_ties: bool = False

    def inputs(self): return (self.input,)

    def with_inputs(self, new_inputs):
        return Limit(new_inputs[0], self.fetch, self.skip,
                     self.with_ties)


@dataclass(eq=False)
class Union(Plan):
    """UNION ALL / UNION (reference federates multi-branch UNION ALL into a
    single remote query: src/sql/mod.rs:608-679)."""

    branches: Sequence[Plan]
    all: bool = True

    def inputs(self): return tuple(self.branches)

    def with_inputs(self, new_inputs):
        return Union(tuple(new_inputs), self.all)


@dataclass(eq=False)
class SetOp(Plan):
    """INTERSECT / EXCEPT (SURVEY.md §2C 'set ops')."""

    left: Plan
    right: Plan
    op: str = "INTERSECT"   # INTERSECT | EXCEPT
    all: bool = False

    def inputs(self): return (self.left, self.right)

    def with_inputs(self, new_inputs):
        return SetOp(new_inputs[0], new_inputs[1], self.op, self.all)


@dataclass(eq=False)
class Distinct(Plan):
    input: Plan

    def inputs(self): return (self.input,)

    def with_inputs(self, new_inputs):
        return Distinct(new_inputs[0])


@dataclass(eq=False)
class OneRow(Plan):
    """FROM-less SELECT: one zero-column row, projected over (the
    DataFusion ``EmptyRelation {{ produce_one_row: true }}`` analog —
    `SELECT 1` parses to exactly this shape in the reference's SQL
    layer). Compiles to ``spark.range(1).select()``; stays local (a
    constant row has no provider to claim it, and every dialect's
    residue handling composes with it as with any local leaf)."""

    def with_inputs(self, new_inputs):
        assert not new_inputs
        return self


@dataclass(eq=False)
class SeriesScan(Plan):
    """``FROM generate_series(start, stop [, step])`` table factor
    (Postgres / DuckDB; r9) — INCLUSIVE bounds, unlike Spark's
    exclusive ``range`` TVF. Compiles to ``spark.range`` with the stop
    adjusted by the step's sign; a sign-mismatched range (start > stop
    with a positive step) is empty, matching both engines. Bounds are
    parse-time integer constants (a column-dependent series belongs in
    a LATERAL body, which this node deliberately does not model).
    Local-only leaf like OneRow: scan_plan assigns the local provider,
    so siblings still claim while the series row source never blocks a
    federation split. 100 TB posture: spark.range distributes the span
    across the default parallelism — no driver materialization."""

    start: int
    stop: int
    step: int = 1
    col: str = "generate_series"

    def with_inputs(self, new_inputs):
        assert not new_inputs
        return self


@dataclass(eq=False)
class RecursiveRef(Plan):
    """Self-reference to an enclosing WITH RECURSIVE CTE (the engines'
    "working table"). Leaf node: at compile time the compiler substitutes
    the PREVIOUS iteration's newly-produced rows (standard semantics —
    Postgres/DuckDB evaluate the recursive term against the working
    table, not the accumulated result). Never federated: the federation
    pass maps it to ambiguous so the fixpoint always runs locally while
    sibling subtrees (the non-recursive term, dimension scans inside the
    step) stay independently claimable."""

    name: str

    def with_inputs(self, new_inputs):
        assert not new_inputs
        return self


@dataclass(eq=False)
class RecursiveCTE(Plan):
    """WITH RECURSIVE fixpoint: ``base UNION [ALL] step`` where ``step``
    contains a :class:`RecursiveRef` to ``name``. The compiler iterates
    step-with-working-table until the step yields no rows (UNION ALL) or
    no NEW rows (UNION — rows already accumulated are subtracted, which
    is what terminates cyclic graphs), capping at ``max_iterations``.

    Spark has no native recursive CTE; the reference inherits one from
    DataFusion's SQL layer. This node keeps the recursion OUTSIDE the
    federation claim (scan_plan sees the RecursiveRef and forces local)
    while each iteration's step is planned by Catalyst like any other
    DataFrame — joins in the step broadcast/shuffle normally, and each
    iteration's delta is localCheckpoint'ed so the logical plan stays
    LINEAR in the iteration count (the d51/d68 PageRank lesson:
    un-checkpointed self-referencing iteration doubles the plan every
    round and OOMs the planner near 7 iterations)."""

    name: str
    cols: Optional[Sequence[str]]     # declared column list, or None
    base: Plan                        # non-recursive term (no RecursiveRef)
    step: Plan                        # recursive term (>=1 RecursiveRef)
    union_all: bool                   # UNION ALL vs UNION (distinct)
    max_iterations: int = 100
    #: SQL:1999 CYCLE clause mark column (parser-desugared): rows whose
    #: mark is TRUE surface in the result but are NOT fed back into the
    #: next round — what terminates UNION ALL walks over cyclic graphs.
    cycle_col: Optional[str] = None
    #: UNION-distinct SEARCH/CYCLE (r9): distinctness is computed on
    #: these USER columns only — the parser-appended seq/mark/path
    #: columns are excluded from the dedup key (Postgres semantics:
    #: rewriteSearchCycle keeps added columns out of the set-op's
    #: duplicate elimination). First-seen row wins; within a round,
    #: ties resolve to the minimal appended-column tuple (documented
    #: deterministic rule; for CYCLE paths this equals the
    #: lexicographically-minimal shortest path). None = dedup on all
    #: columns (plain UNION distinct).
    dedup_cols: Optional[Sequence[str]] = None
    #: the CYCLE mark's "cycle detected" value (SQL:1999 TO v DEFAULT
    #: dv, r9): rows whose mark equals this value never recurse. True
    #: for the plain boolean form.
    cycle_mark_value: Any = True

    def inputs(self): return (self.base, self.step)

    def with_inputs(self, new_inputs):
        return RecursiveCTE(self.name, self.cols, new_inputs[0],
                            new_inputs[1], self.union_all,
                            self.max_iterations, self.cycle_col,
                            self.dedup_cols, self.cycle_mark_value)


@dataclass(eq=False)
class LateralJoin(Plan):
    """LATERAL derived table: ``left [INNER|LEFT] JOIN LATERAL (subquery)
    alias ON cond`` / ``left, LATERAL (...)``. The right subplan holds
    OuterRef expressions against the left side's aliases — the per-row
    dependency engines evaluate by re-running the subquery per outer row.
    We NEVER execute per-row: the compiler decorrelates to set-level
    plans (equi-join for plain bodies, grouped-aggregate LEFT join with
    empty-group fixups for ungrouped aggregates, partitioned row_number
    for ORDER BY + LIMIT top-k-per-key) and refuses shapes it cannot
    rewrite faithfully. Never federated — scan_expr sees the unvetted
    OuterRefs inside ``right`` and forces the node local; the left
    subtree still claims independently."""

    left: Plan
    right: Plan
    how: str = "inner"                 # inner | left | cross
    condition: Optional[Expr] = None   # explicit ON (compiled post-join)

    def inputs(self): return (self.left, self.right)

    def exprs(self):
        return (self.condition,) if self.condition is not None else ()

    def with_inputs(self, new_inputs):
        return LateralJoin(new_inputs[0], new_inputs[1], self.how,
                           self.condition)


@dataclass(eq=False)
class SubqueryAlias(Plan):
    """Derived table `(...) AS alias` (golden at src/sql/analyzer.rs:786-792)."""

    input: Plan
    alias: str

    def inputs(self): return (self.input,)

    def with_inputs(self, new_inputs):
        return SubqueryAlias(new_inputs[0], self.alias)


@dataclass(eq=False)
class Analyze(Plan):
    """EXPLAIN ANALYZE wrapper. Never federated as a whole — the unparser
    cannot emit it; the federation pass federates only its input
    (reference src/optimizer/mod.rs:194-209, test src/sql/mod.rs:772-818).
    ``engine.explain(plan, analyze=True)`` executes the input and reports
    runtime metrics (the AnalyzeExec analog)."""

    input: Plan

    def inputs(self): return (self.input,)

    def with_inputs(self, new_inputs):
        return Analyze(new_inputs[0])


@dataclass(eq=False)
class RemoteQueryNode(Plan):
    """Opaque federated leaf — the FederatedPlanNode/VirtualExecutionPlan
    analog (reference src/plan_node.rs:18-73, src/sql/mod.rs:164-445).

    Holds the claimed sub-plan, its provider, and the staged SQL strings so
    ``explain()`` can show base vs rewritten SQL like the reference's
    EXPLAIN output (src/sql/mod.rs:303-368).
    """

    plan: Plan
    provider: Any                     # sources.provider.SQLProvider
    sql: str
    schema: Any = None                # pyspark StructType (expected schema)
    base_sql: Optional[str] = None    # pre-hook SQL for explain()
    #: runtime filter predicates (SQL strings over the node's output
    #: columns) accepted from the parent plan — the VirtualExecutionPlan
    #: filter-pushdown analog (reference src/sql/mod.rs:416-444); the
    #: executor may inline or ignore them (src/sql/executor.rs:45-56)
    runtime_filters: Sequence[str] = ()

    def with_inputs(self, new_inputs):
        assert not new_inputs
        return self

    def with_runtime_filters(self, filters: Sequence[str]
                             ) -> "RemoteQueryNode":
        return RemoteQueryNode(self.plan, self.provider, self.sql,
                               self.schema, self.base_sql,
                               tuple(self.runtime_filters) + tuple(filters))


@dataclass(eq=False)
class Unpivot(Plan):
    """`rel UNPIVOT [INCLUDE NULLS] (value FOR name IN (c1, c2, ...))`
    (SQL:2016-style; DuckDB and Spark SQL share the spelling). Rows
    widen: each input row yields one output row per named column, the
    NAME column carrying the source column's name and the VALUE column
    its value; NULL values drop unless INCLUDE NULLS. Compiles to
    DataFrame.unpivot (ids = every other column) + a value filter —
    a narrow per-row expansion, no shuffle. Kept local (scan_plan
    posture like LateralJoin); the input still federates."""

    input: Plan
    cols: Sequence[str] = ()
    value_col: str = "value"
    name_col: str = "name"
    include_nulls: bool = False

    def inputs(self): return (self.input,)

    def exprs(self): return ()

    def with_inputs(self, new_inputs):
        return Unpivot(new_inputs[0], self.cols, self.value_col,
                       self.name_col, self.include_nulls)


@dataclass(eq=False)
class Pivot(Plan):
    """`rel PIVOT (agg(x) FOR key IN (v1, v2, ...))` (DuckDB/Spark SQL
    spelling) and — r10, VERDICT r9 Next #3 — the implicit-value form
    behind DuckDB's simplified `PIVOT rel ON key USING agg(x)`
    statement: ``values=None`` makes the compiler run the engines' own
    two-phase protocol (a bounded `SELECT DISTINCT key` pre-query,
    ascending order, loud overflow above the cap) before the explicit-
    list lowering. Groups implicitly by every column not consumed by
    the aggregate or the key, one output column per value named by the
    value. Compiles to groupBy(ids).pivot(key, values).agg(...) — one
    shuffle, same as the equivalent FILTER-aggregate spelling. Kept
    local; the input still federates."""

    input: Plan
    agg: Expr = None                     # AggFunc (single-agg form)
    pivot_col: str = ""
    values: Optional[Sequence[Any]] = ()  # literals; None = discover
    #: r10: multi-aggregate USING (each an Alias over an AggFunc);
    #: when set, ``agg`` is ignored. Output columns follow the shared
    #: DuckDB/Spark naming: one {value}_{alias} per (value, agg),
    #: value-major order.
    aggs: Optional[Sequence[Expr]] = None
    #: r11 (VERDICT r10 Next #5): multi-key simplified `PIVOT rel ON
    #: a, b USING ...` — when set, ``pivot_col`` is ignored and the
    #: compiler discovers each key's distinct values INDEPENDENTLY,
    #: crossing them (DuckDB's rule: columns for every combination,
    #: observed or not) into `{va}_{vb}[_{alias}]` names, first key
    #: major. Always implicit discovery (``values`` must be None).
    pivot_cols: Optional[Sequence[str]] = None

    def inputs(self): return (self.input,)

    def exprs(self):
        if self.aggs is not None:
            return tuple(self.aggs)
        return (self.agg,) if self.agg is not None else ()

    def with_inputs(self, new_inputs):
        return Pivot(new_inputs[0], self.agg, self.pivot_col,
                     self.values, self.aggs, self.pivot_cols)


@dataclass(eq=False)
class TableSample(Plan):
    """`rel TABLESAMPLE BERNOULLI(p [PERCENT]) [REPEATABLE (seed)]`
    (SQL:2003 / Postgres / DuckDB spelling; r11, VERDICT r10 Next #6).
    DETERMINISTIC hash-Bernoulli: both engines' native TABLESAMPLE is
    an RNG draw, which this repo's rerun-stable contract forbids —
    the lowering keeps a row iff the 4-hex-digit md5 prefix of its
    seed-salted row key sorts below round(p*65536/100) (r12: each
    column renders through its own md5 with a NULL sentinel — an
    unambiguous key, unlike concat_ws — and rates below the 1/65536
    granularity refuse; oracle SQL replays the identical predicate).
    Identical rows co-sample, and
    the sample is independent of partition layout: at 100 TB it is a
    narrow filter on the scan, no shuffle, no RNG state. SYSTEM
    (block) sampling refuses honestly — Spark has no stable notion of
    a storage block to sample. r12: this node survives parse only for
    inputs whose schema is unknown or render-unstable — statically
    typed shapes lower to a plain Filter at parse time, so the
    predicate CLAIMS into remote SQL and the engine that owns the
    data does the sampling (sqlfront._make_tablesample)."""

    input: Plan
    pct: float = 0.0
    seed: int = 0

    def inputs(self): return (self.input,)

    def exprs(self): return ()

    def with_inputs(self, new_inputs):
        return TableSample(new_inputs[0], self.pct, self.seed)


def walk_plan(p: Plan):
    """Yield p and all descendant plan nodes."""
    yield p
    for i in p.inputs():
        yield from walk_plan(i)
