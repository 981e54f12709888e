"""Plan -> SQL unparser.

The reference gets this from DataFusion (``Unparser::new(dialect)
.plan_to_sql(plan)``, src/sql/mod.rs:229-232); it is our single biggest
net-new component (SURVEY.md §7 "hard parts" #1). Renders a federated
sub-plan (whose scans all belong to one provider) into a single SQL
statement in the provider's dialect, so the remote engine executes the whole
subtree — joins, aggregates, windows, sorts, limits — close to storage.

Strategy: build a SELECT "query shell" per plan pipeline, nesting derived
tables whenever a new shell is needed (e.g. filter above an aggregate that
isn't a HAVING, limit under a projection, set operations).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

from .dialects import Dialect, UnsupportedUnparse, get_dialect
from .expressions import (
    Alias, Col, Cube, Expr, GroupingSets, Rollup, SortKey, Star,
)
from .plans.nodes import (
    Aggregate, Distinct, Filter, Join, Limit, Plan, Project, RemoteQueryNode,
    Scan, SetOp, Sort, SubqueryAlias, Union, Window, walk_plan,
)

# join keywords live on the Dialect (dialects.py join_keywords) — the
# spelling varies per engine (semi/anti especially)


@dataclass
class _Shell:
    """One SELECT ... FROM ... [JOIN]* [WHERE] [GROUP BY] [HAVING]
    [ORDER BY] [LIMIT] under construction."""

    from_sql: str = ""
    joins: List[str] = field(default_factory=list)
    select: Optional[List[str]] = None
    where: List[str] = field(default_factory=list)
    group_by: Optional[List[str]] = None
    having: List[str] = field(default_factory=list)
    order_by: Optional[List[str]] = None
    limit: Optional[str] = None
    distinct: bool = False
    #: select list came from a Scan's column pruning (plain quoted
    #: columns, no aliases) — a WHERE can share the shell because SQL
    #: predicates see the TABLE's columns, not the select list
    select_is_scan_projection: bool = False

    def render(self) -> str:
        sel = ", ".join(self.select) if self.select else "*"
        if self.distinct:
            sel = "DISTINCT " + sel
        # empty from_sql = a OneRow (FROM-less) shell: the dialect
        # accepted it (one_row_from None) so the FROM clause is omitted
        sql = (f"SELECT {sel} FROM {self.from_sql}" if self.from_sql
               else f"SELECT {sel}")
        for j in self.joins:
            sql += " " + j
        if self.where:
            sql += " WHERE " + " AND ".join(self.where)
        if self.group_by:
            sql += " GROUP BY " + ", ".join(self.group_by)
        if self.having:
            sql += " HAVING " + " AND ".join(self.having)
        if self.order_by:
            sql += " ORDER BY " + ", ".join(self.order_by)
        if self.limit:
            sql += " " + self.limit
        return sql


class Unparser:
    def __init__(self, dialect="ansi"):
        self.dialect: Dialect = get_dialect(dialect)
        self._alias_n = 0

    # ------------------------------------------------------------------
    def plan_to_sql(self, plan: Plan) -> str:
        from .plans.nodes import VerbatimSQLPlan
        if isinstance(plan, VerbatimSQLPlan):
            # pre-claimed DML subquery SQL (r13) — already rendered in
            # this dialect with remote table names; splice verbatim
            return plan.sql
        return self._to_query(plan)

    # ------------------------------------------------------------------
    def _fresh_alias(self) -> str:
        self._alias_n += 1
        return f"__q{self._alias_n}"

    def _to_query(self, plan: Plan) -> str:
        """Render a full query string for `plan`."""
        if isinstance(plan, Union):
            kw = " UNION ALL " if plan.all else " UNION "
            return kw.join(self._branch_query(b) for b in plan.branches)
        if isinstance(plan, SetOp):
            kw = f" {plan.op}{' ALL' if plan.all else ''} "
            return kw.join([self._branch_query(plan.left),
                            self._branch_query(plan.right)])
        # Bare ORDER BY / LIMIT over a set operation — ONLY for the two
        # shapes whose SQL spelling has the same meaning: Sort(setop) and
        # Limit(Sort(setop)) / Limit(setop). Anything else (Sort above
        # Limit = "take N then sort", stacked limits) falls through to
        # the shell path, which nests derived tables and preserves
        # semantics.
        simple = None
        if isinstance(plan, Sort) and isinstance(plan.input, (Union, SetOp)):
            simple = (plan, None, plan.input)
        elif isinstance(plan, Limit):
            if isinstance(plan.input, (Union, SetOp)):
                simple = (None, plan, plan.input)
            elif (isinstance(plan.input, Sort)
                  and isinstance(plan.input.input, (Union, SetOp))):
                simple = (plan.input, plan, plan.input.input)
        if simple is not None:
            sort_n, limit_n, inner = simple
            sql = self._to_query(inner)
            if sort_n is not None:
                sql += " ORDER BY " + ", ".join(
                    k.to_sql(self.dialect) for k in sort_n.keys)
            if limit_n is not None:
                if getattr(limit_n, "with_ties", False):
                    from .dialects import UnsupportedUnparse
                    if not (getattr(self.dialect,
                                    "supports_fetch_with_ties", False)
                            and sort_n is not None):
                        raise UnsupportedUnparse(
                            "FETCH ... WITH TIES over a set operation "
                            "has no rendering for this dialect")
                    skip_sql = (f"OFFSET {limit_n.skip} "
                                if limit_n.skip is not None else "")
                    sql += (f" {skip_sql}FETCH FIRST {limit_n.fetch} "
                            f"ROWS WITH TIES")
                else:
                    sql += " " + self.dialect.limit_clause(
                        limit_n.fetch, limit_n.skip)
            return sql
        shell = self._build_shell(plan)
        return shell.render()

    def _branch_query(self, b: Plan) -> str:
        """A set-operation branch carrying its own ORDER BY/LIMIT must be
        scoped, or the LIMIT binds to the whole union; a NESTED set
        operation must be scoped too, or standard precedence (INTERSECT
        binds tighter; left associativity) silently re-groups the
        expression. Wrap as a derived table (bare parens around a SELECT
        are rejected by SQLite)."""
        if isinstance(b, (Sort, Limit, Union, SetOp)):
            a = self.dialect.quote(self._fresh_alias())
            return f"SELECT * FROM ({self._to_query(b)}) AS {a}"
        return self._to_query(b)

    def _expand_stars(self, projections: Sequence[Expr], input_plan: Plan
                      ) -> Sequence[Expr]:
        """Expand `* EXCEPT/EXCLUDE (...)` / `* REPLACE (...)` into an
        explicit column list when the target dialect has no native syntax
        for the option (DuckDB: EXCLUDE+REPLACE; Spark: EXCEPT only;
        Postgres/SQLite/MySQL: neither). Mirrors DataFusion's bind-time
        wildcard-options expansion (reference analyzer posture,
        datafusion expand_wildcard_rule); DuckDB itself macro-expands
        EXCLUDE the same way."""
        d = self.dialect

        def needs_expansion(e: Expr) -> bool:
            return isinstance(e, Star) and (
                (bool(e.exclude)
                 and getattr(d, "star_exclude_kw", None) is None)
                or (bool(e.replace)
                    and not getattr(d, "supports_star_replace", True)))

        if not any(needs_expansion(e) for e in projections):
            return projections
        out: List[Expr] = []
        for e in projections:
            if not needs_expansion(e):
                out.append(e)
                continue
            if e.table is not None:
                raise UnsupportedUnparse(
                    f"dialect {d.name!r} cannot render qualified "
                    f"{d.quote(e.table)}.* with EXCEPT/REPLACE options and "
                    "per-relation column lists are not tracked; compile "
                    "this projection locally")
            from .compiler import _plan_output_cols
            from .expressions import expand_star_options
            cols = _plan_output_cols(input_plan)
            if cols is None:
                raise UnsupportedUnparse(
                    f"dialect {d.name!r} has no * EXCEPT/REPLACE syntax and "
                    "the input columns are unknown; compile this "
                    "projection locally")
            out.extend(expand_star_options(cols, e))
        return out

    # ------------------------------------------------------------------
    def _relation_sql(self, plan: Plan, alias: Optional[str] = None) -> str:
        """Render `plan` as a FROM-clause relation (table ref or derived
        table)."""
        d = self.dialect
        if isinstance(plan, Scan):
            ref = plan.table.remote_sql_ref(d)
            if alias is None:
                alias = self._scan_auto_alias(plan)
            if plan.projection:
                # a pruned scan used AS A RELATION must keep its column
                # list (the expected schema counts the pruned width) —
                # render as a derived table
                cols = ", ".join(d.quote(c) for c in plan.projection)
                a = alias or plan.table.local_name
                return f"(SELECT {cols} FROM {ref}) AS {d.quote(a)}"
            if alias:
                ref += f" AS {d.quote(alias)}"
            return ref
        if isinstance(plan, SubqueryAlias):
            return self._relation_sql(plan.input, alias=plan.alias)
        sub = self._to_query(plan)
        a = alias or self._fresh_alias()
        return f"({sub}) AS {d.quote(a)}"

    @staticmethod
    def _scan_auto_alias(plan: Scan) -> Optional[str]:
        """Alias a scanned relation with its LOCAL name when (a) the remote
        name differs — so column refs qualified by the local name stay
        valid (our trivial RewriteTableScanAnalyzer: handles carry remote
        refs from registration, SURVEY.md §2B) — or (b) the reference is a
        parameterized table function, which requires an alias (reference
        TableArgReplace appends one, src/sql/ast_analyzer.rs:40-109;
        golden `FROM table_b1(1) AS table_b1`, src/sql/mod.rs:670)."""
        t = plan.table
        if t.remote is None:
            return None
        if t.remote.ref.args is not None:
            return t.local_name
        if t.remote.ref.name != t.local_name:
            return t.local_name
        return None

    def _build_shell(self, plan: Plan) -> _Shell:
        d = self.dialect

        if isinstance(plan, (Scan, SubqueryAlias, RemoteQueryNode)):
            if isinstance(plan, RemoteQueryNode):
                raise ValueError("cannot unparse an already-federated node "
                                 "(double-federation guard)")
            sh = _Shell(from_sql=self._relation_sql(plan))
            if isinstance(plan, Scan) and plan.projection:
                sh.select = [d.quote(c) for c in plan.projection]
                sh.select_is_scan_projection = True
            return sh

        if isinstance(plan, Project):
            sh = self._build_shell(plan.input)
            if sh.select is not None or sh.distinct:
                sh = _Shell(from_sql=f"({sh.render()}) AS {d.quote(self._fresh_alias())}")
            sh.select = [e.to_sql(d)
                         for e in self._expand_stars(plan.projections,
                                                     plan.input)]
            sh.select_is_scan_projection = False
            return sh

        if isinstance(plan, Filter):
            sh = self._build_shell(plan.input)
            pred = plan.predicate.to_sql(d)
            if (sh.group_by is not None or sh.limit or sh.having
                    or sh.distinct
                    or (sh.select is not None
                        and not sh.select_is_scan_projection)):
                # A filter above an aggregation/projection wraps it as a
                # derived table and uses WHERE: the predicate may reference
                # SELECT-list aliases, which is legal against a derived
                # table in every dialect (HAVING-by-alias is DuckDB-only,
                # rejected by PostgreSQL/ANSI). Aggregate.having still
                # renders as HAVING with the raw aggregate expression.
                sh = _Shell(from_sql=f"({sh.render()}) AS {d.quote(self._fresh_alias())}")
            sh.where.append(pred)
            return sh

        if isinstance(plan, Join):
            # A WHERE on the left input commutes with inner/left/cross joins
            # but not right/full — wrap in that case.
            wrap_where = plan.how in ("right", "full")
            lsh = self._build_shell_as_relation(plan.left, wrap_where)
            rrel = self._relation_sql_for_join(plan.right)
            if (plan.how in ("semi", "anti")
                    and not d.supports_semi_anti_join):
                # Dialects without native SEMI/ANTI JOIN syntax
                # (ANSI/Postgres/MySQL/SQLite) get the EXISTS spelling.
                if plan.using:
                    raise UnsupportedUnparse(
                        "semi/anti USING join needs a dialect with native "
                        "SEMI JOIN syntax; use an ON condition instead")
                cond = (plan.condition.to_sql(d)
                        if plan.condition is not None else "TRUE")
                neg = "NOT " if plan.how == "anti" else ""
                lsh.where.append(
                    f"{neg}EXISTS (SELECT 1 FROM {rrel} WHERE {cond})")
                return lsh
            sh = lsh
            kw = d.join_keyword(plan.how)
            if plan.how == "cross":
                sh.joins.append(f"CROSS JOIN {rrel}")
            elif plan.using:
                cols = ", ".join(d.quote(c) for c in plan.using)
                sh.joins.append(f"{kw} {rrel} USING ({cols})")
            else:
                cond = plan.condition.to_sql(d) if plan.condition is not None else "TRUE"
                sh.joins.append(f"{kw} {rrel} ON {cond}")
            return sh

        from .plans.nodes import AsofJoin as _AsofJoin
        if isinstance(plan, _AsofJoin):
            if not d.supports_asof_join:
                raise UnsupportedUnparse(
                    f"dialect {d.name!r} has no native ASOF JOIN — the "
                    "federation gate should have kept this plan local")
            if plan.condition is None:
                raise UnsupportedUnparse(
                    "ASOF JOIN requires an ON condition (there is no "
                    "meaningful ON TRUE form)")
            # a left-side WHERE commutes with both inner and left asof
            lsh = self._build_shell_as_relation(plan.left, False)
            rrel = self._relation_sql_for_join(plan.right)
            cond = plan.condition.to_sql(d)
            kw = "ASOF LEFT JOIN" if plan.how == "left" else "ASOF JOIN"
            lsh.joins.append(f"{kw} {rrel} ON {cond}")
            return lsh

        if isinstance(plan, Aggregate):
            sh = self._build_shell(plan.input)
            if (sh.select is not None or sh.group_by is not None or sh.limit
                    or sh.distinct or sh.order_by):
                # order_by too: GROUP BY + an inherited ORDER BY over a
                # non-grouped column is rejected by ANSI/PostgreSQL
                sh = _Shell(from_sql=f"({sh.render()}) AS {d.quote(self._fresh_alias())}")
            # GROUP BY keys: bare expressions (an aliased key renders its
            # underlying expr — `GROUP BY x AS y` is a syntax error)
            keys = []
            for g in plan.group_by:
                keys.append(g.expr.to_sql(d) if isinstance(g, Alias)
                            else g.to_sql(d))
            sh.group_by = keys or None
            # SELECT list: grouping keys (incl. the member columns of
            # rollup/cube/grouping sets — they are output columns), then
            # aggregates
            sel = []
            seen = set()
            for g in plan.group_by:
                if isinstance(g, (Rollup, Cube)):
                    members = list(g.exprs)
                elif isinstance(g, GroupingSets):
                    members = [e for s in g.sets for e in s]
                else:
                    members = [g]
                for m in members:
                    s = m.to_sql(d)
                    key = (m.expr.to_sql(d) if isinstance(m, Alias) else s)
                    if key not in seen:
                        seen.add(key)
                        sel.append(s)
            sel += [a.to_sql(d) for a in plan.aggregates]
            sh.select = sel
            if plan.having is not None:
                sh.having.append(plan.having.to_sql(d))
            if not keys:
                sh.group_by = None
            return sh

        if isinstance(plan, Window):
            sh = self._build_shell(plan.input)
            if (sh.select is not None or sh.group_by is not None
                    or sh.limit or sh.distinct):
                # distinct too: SELECT DISTINCT *, win OVER(...) would
                # dedup AFTER the window instead of before
                sh = _Shell(from_sql=f"({sh.render()}) AS {d.quote(self._fresh_alias())}")
            sh.select = ["*"] + [e.to_sql(d) for e in plan.window_exprs]
            return sh

        if isinstance(plan, Sort):
            sh = self._build_shell(plan.input)
            if sh.limit:
                sh = _Shell(from_sql=f"({sh.render()}) AS {d.quote(self._fresh_alias())}")
            sh.order_by = [k.to_sql(d) for k in plan.keys]
            return sh

        if isinstance(plan, Limit):
            sh = self._build_shell(plan.input)
            if sh.limit:
                sh = _Shell(from_sql=f"({sh.render()}) AS {d.quote(self._fresh_alias())}")
            if getattr(plan, "with_ties", False):
                from .dialects import UnsupportedUnparse
                if not getattr(d, "supports_fetch_with_ties", False):
                    raise UnsupportedUnparse(
                        f"dialect {d.name!r} has no FETCH ... WITH TIES "
                        "syntax")
                if not sh.order_by:
                    # WITH TIES is invalid SQL without ORDER BY in the
                    # same query block — compile locally instead
                    raise UnsupportedUnparse(
                        "FETCH ... WITH TIES lost its ORDER BY block "
                        "during shell nesting")
                skip_sql = (f"OFFSET {plan.skip} "
                            if plan.skip is not None else "")
                sh.limit = (f"{skip_sql}FETCH FIRST {plan.fetch} "
                            f"ROWS WITH TIES")
            else:
                sh.limit = d.limit_clause(plan.fetch, plan.skip)
            return sh

        if isinstance(plan, Distinct):
            sh = self._build_shell(plan.input)
            if (sh.group_by is not None or sh.limit or sh.distinct
                    or sh.order_by):
                sh = _Shell(from_sql=f"({sh.render()}) AS {d.quote(self._fresh_alias())}")
            sh.distinct = True
            return sh

        if isinstance(plan, (Union, SetOp)):
            return _Shell(
                from_sql=f"({self._to_query(plan)}) AS {d.quote(self._fresh_alias())}")

        from .plans.nodes import OneRow as _OneRow
        if isinstance(plan, _OneRow):
            # FROM-less SELECT (r12, scanless write-back): dialects
            # that accept SELECT-without-FROM render an empty shell;
            # the rest get their one-row dummy table (Derby:
            # SYSIBM.SYSDUMMY1)
            return _Shell(from_sql=d.one_row_from or "")

        raise ValueError(f"cannot unparse plan node {type(plan).__name__}")

    def _build_shell_as_relation(self, plan: Plan,
                                 wrap_where: bool = False) -> _Shell:
        """Left side of a join: reuse the shell if it is still a bare
        relation chain (scan/filter), else wrap as derived table. The
        derived table takes the subtree's NATURAL alias (SubqueryAlias
        name, or the single underlying scan's local name) so join/EXISTS
        conditions qualified by the original table name stay resolvable;
        a fresh __qN alias is the last resort."""
        sh = self._build_shell(plan)
        if (sh.select is not None or sh.group_by is not None or sh.limit
                or sh.order_by or sh.distinct or sh.having
                or (wrap_where and sh.where)):
            a = self._natural_alias(plan) or self._fresh_alias()
            return _Shell(from_sql=(f"({sh.render()}) AS "
                                    f"{self.dialect.quote(a)}"))
        return sh

    def _relation_sql_for_join(self, plan: Plan) -> str:
        if isinstance(plan, (Scan, SubqueryAlias)):
            return self._relation_sql(plan)
        a = self._natural_alias(plan) or self._fresh_alias()
        return (f"({self._to_query(plan)}) AS "
                f"{self.dialect.quote(a)}")

    @staticmethod
    def _natural_alias(plan: Plan) -> Optional[str]:
        """The name column references inside this subtree are qualified
        with: an explicit SubqueryAlias, or — when exactly one scan lies
        underneath — that scan's local name."""
        if isinstance(plan, SubqueryAlias):
            return plan.alias
        scans = [n for n in walk_plan(plan) if isinstance(n, Scan)]
        if len(scans) == 1:
            return scans[0].table.local_name
        return None
