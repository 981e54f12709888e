"""Plan -> PySpark DataFrame compiler (the local execution path).

The reference delegates all local relational execution to DataFusion
(SURVEY.md §4: join reordering, pushdown, codegen all delegated); our local
engine is Catalyst/Tungsten. This module turns plan-IR nodes into declarative
DataFrame operations so Spark owns physical strategy — predicate pushdown to
parquet, column pruning, broadcast-vs-sort-merge join selection, AQE, and
whole-stage codegen all apply untouched.

RemoteQueryNode leaves (produced by the federation pass) execute via their
provider's SQLExecutor and get a schema-cast projection appended —
the SchemaCastScanExec analog (reference src/schema_cast/mod.rs:27-146).
"""

from __future__ import annotations

from typing import Any, List

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .expressions import Alias, Col, Cube, Expr, GroupingSets, Rollup, Star
from .plans.nodes import (
    Aggregate, Distinct, Filter, Join, Limit, Plan, Project, RemoteQueryNode,
    Scan, SetOp, Sort, SubqueryAlias, Union, Window,
)
from .schema_cast import cast_dataframe

_JOIN_HOW = {
    "inner": "inner", "left": "left", "right": "right", "full": "outer",
    "cross": "cross", "semi": "left_semi", "anti": "left_anti",
}


class Compiler:
    def __init__(self, spark: SparkSession,
                 broadcast_threshold_rows: int = 1_000_000):
        self.spark = spark
        self.broadcast_threshold_rows = broadcast_threshold_rows

    # ------------------------------------------------------------------
    def compile(self, plan: Plan) -> DataFrame:
        return self._c(plan)

    # ------------------------------------------------------------------
    def _c(self, p: Plan) -> DataFrame:
        if isinstance(p, RemoteQueryNode):
            df = p.provider.executor.execute(self.spark, p.sql,
                                             schema=p.schema)
            if p.schema is not None:
                # SchemaCastScanExec analog: cast the remote result to the
                # plan's expected schema right after the read.
                df = cast_dataframe(df, p.schema)
            # statistics-driven broadcast posture: a known-small federated
            # result is a broadcast candidate for downstream joins
            # (reference statistics hook, src/sql/executor.rs:61-63).
            est = p.provider.executor.statistics(p.sql)
            if est is not None and est <= self.broadcast_threshold_rows:
                df = F.broadcast(df)
            return df

        if isinstance(p, Scan):
            t = p.table
            if t.fallback_path is not None:
                df = self.spark.read.parquet(t.fallback_path)
            elif t.provider is not None and hasattr(t.provider, "executor"):
                # fallback provider path: whole-table remote read
                # (FederatedTableProviderAdaptor fallback,
                # reference src/table_provider.rs:110-124)
                ref = t.remote_sql_ref(t.provider.dialect)
                df = t.provider.executor.execute(
                    self.spark, f"SELECT * FROM {ref}")
            else:
                df = self.spark.table(t.local_name)
            if p.projection:
                df = df.select(*p.projection)  # column pruning at the scan
            return df.alias(t.local_name)

        if isinstance(p, Project):
            df = self._c(p.input)
            return df.select(*[self._col(e, df) for e in p.projections])

        if isinstance(p, Filter):
            from .expressions import Exists, InSubquery, walk as walk_expr
            subq = [n for n in walk_expr(p.predicate)
                    if isinstance(n, (Exists, InSubquery))]
            if subq:
                return self._compile_subquery_filter(p)
            return self._c(p.input).filter(p.predicate.to_spark())

        if isinstance(p, Join):
            left = self._c(p.left)
            right = self._c(p.right)
            how = _JOIN_HOW[p.how]
            if p.how == "cross":
                return left.crossJoin(right)
            on = p.using if p.using else (
                p.condition.to_spark() if p.condition is not None else None)
            return left.join(right, on=on, how=how)

        if isinstance(p, Aggregate):
            df = self._c(p.input)
            aggs = [self._col(a, df) for a in p.aggregates]
            gb = self._grouping(df, p.group_by)
            out = gb.agg(*aggs) if aggs else gb.agg(F.count(F.lit(1)))
            if p.having is not None:
                out = out.filter(p.having.to_spark())
            return out

        if isinstance(p, Window):
            df = self._c(p.input)
            cols = [F.col("*")] + [self._col(e, df) for e in p.window_exprs]
            return df.select(*cols)

        if isinstance(p, Sort):
            df = self._c(p.input)
            return df.orderBy(*[k.to_spark() for k in p.keys])

        if isinstance(p, Limit):
            df = self._c(p.input)
            if p.skip:
                df = df.offset(p.skip)
            if p.fetch is not None:
                df = df.limit(p.fetch)
            return df

        if isinstance(p, Union):
            dfs = [self._c(b) for b in p.branches]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=False)
            return out if p.all else out.distinct()

        if isinstance(p, SetOp):
            l, r = self._c(p.left), self._c(p.right)
            if p.op == "INTERSECT":
                return l.intersectAll(r) if p.all else l.intersect(r)
            return l.exceptAll(r) if p.all else l.subtract(r)

        if isinstance(p, Distinct):
            return self._c(p.input).distinct()

        if isinstance(p, SubqueryAlias):
            return self._c(p.input).alias(p.alias)

        raise ValueError(f"cannot compile plan node {type(p).__name__}")

    # ------------------------------------------------------------------
    def _col(self, e: Expr, df: DataFrame):
        from .expressions import ScalarSubquery

        # scalar subqueries: execute the (already federated) subplan and
        # inline the scalar as a literal — DataFusion decorrelates these to
        # joins before federation; ours are uncorrelated by construction
        # (correlated ones are refused, reference optimizer/mod.rs:114-120).
        def replace(x: Expr) -> Expr:
            if isinstance(x, ScalarSubquery):
                from .expressions import Lit
                val = self._c(x.plan).collect()[0][0]
                return Lit(val)
            return x

        e = _rewrite_expr(e, replace)
        return e.to_spark()

    def _grouping(self, df: DataFrame, group_by):
        plain = [g for g in group_by
                 if not isinstance(g, (Rollup, Cube, GroupingSets))]
        special = [g for g in group_by
                   if isinstance(g, (Rollup, Cube, GroupingSets))]
        if not special:
            return df.groupBy(*[g.to_spark() for g in plain])
        assert len(special) == 1 and not plain, \
            "mixed grouping-set forms are not supported"
        s = special[0]
        if isinstance(s, Rollup):
            return df.rollup(*[e.to_spark() for e in s.exprs])
        if isinstance(s, Cube):
            return df.cube(*[e.to_spark() for e in s.exprs])
        # GROUPING SETS has no DataFrame API — compile via groupingSets
        # column-set form (Spark >= 4.0) if available, else SQL fallback.
        sets = [[e.to_spark() for e in one] for one in s.sets]
        return df.groupingSets(sets)

    def _compile_subquery_filter(self, p: Filter) -> DataFrame:
        """EXISTS / IN subqueries compile to LEFT SEMI / LEFT ANTI joins
        (SURVEY.md §2C; the reference keeps them local too)."""
        from .expressions import Exists, InSubquery
        pred = p.predicate
        df = self._c(p.input)
        if isinstance(pred, Exists):
            sub = self._c(pred.plan)
            how = "left_anti" if pred.negated else "left_semi"
            # uncorrelated EXISTS: keep-all or keep-none
            return df.join(sub.limit(1), how=how,
                           on=F.lit(True))
        if isinstance(pred, InSubquery):
            sub = self._c(pred.plan)
            sub_col = sub.columns[0]
            how = "left_anti" if pred.negated else "left_semi"
            return df.join(sub, on=pred.expr.to_spark() == sub[sub_col],
                           how=how)
        raise ValueError("subquery predicates must be top-level in a Filter")


def _rewrite_expr(e: Expr, fn) -> Expr:
    """Bottom-up expression rewrite (immutable nodes rebuilt via dataclass
    field replacement where needed)."""
    import dataclasses
    new = fn(e)
    if new is not e:
        return new
    if not dataclasses.is_dataclass(e):
        return e
    changed = False
    updates = {}
    for f in dataclasses.fields(e):
        v = getattr(e, f.name)
        if isinstance(v, Expr):
            nv = _rewrite_expr(v, fn)
            if nv is not v:
                updates[f.name] = nv
                changed = True
        elif isinstance(v, (list, tuple)):
            nl = []
            item_changed = False
            for item in v:
                if isinstance(item, Expr):
                    ni = _rewrite_expr(item, fn)
                    item_changed = item_changed or ni is not item
                    nl.append(ni)
                elif (isinstance(item, tuple) and len(item) == 2
                      and all(isinstance(x, Expr) for x in item)):
                    a = _rewrite_expr(item[0], fn)
                    b = _rewrite_expr(item[1], fn)
                    item_changed = item_changed or a is not item[0] or b is not item[1]
                    nl.append((a, b))
                else:
                    nl.append(item)
            if item_changed:
                updates[f.name] = type(v)(nl) if isinstance(v, tuple) else nl
                changed = True
    if changed:
        return dataclasses.replace(e, **updates)
    return e
