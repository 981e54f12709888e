"""Remote tables and table references.

Mirrors the reference's SQLTable / RemoteTable / RemoteTableRef layer
(datafusion-federation/src/sql/table.rs:22-53,
src/sql/table_reference.rs:29-101) plus the per-table rewrite hooks
(table.rs:33-45): ``logical_optimizer`` (plan->plan, schema-stable),
``ast_analyzer`` (sql-ast-ish -> same), ``sql_query_rewriter``
(str -> str, applied last).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Sequence

from ..dialects import split_table_name


@dataclass
class RemoteTableRef:
    """1-3 part table name + optional table-function args (parameterized
    views like ``schema.view(name => 'obj')`` — reference
    src/sql/table_reference.rs, src/sql/ast_analyzer.rs:40-109)."""

    parts: Sequence[str]
    args: Optional[Sequence[str]] = None    # rendered arg strings

    @classmethod
    def parse(cls, text: str) -> "RemoteTableRef":
        text = text.strip()
        m = re.match(r"^(.*?)\((.*)\)\s*$", text, re.S)
        args = None
        if m:
            text, arg_text = m.group(1).strip(), m.group(2).strip()
            args = ([a.strip() for a in _split_args(arg_text)]
                    if arg_text else [])
        return cls(parts=split_table_name(text), args=args)

    @property
    def name(self) -> str:
        return self.parts[-1]

    def to_sql(self, dialect) -> str:
        base = ".".join(dialect.quote(p) for p in self.parts)
        if self.args is not None:
            base += "(" + ", ".join(self.args) + ")"
        return base


def _split_args(text: str) -> List[str]:
    """Split on top-level commas (respects quotes/parens)."""
    out, depth, cur, in_q = [], 0, "", None
    for ch in text:
        if in_q:
            cur += ch
            if ch == in_q:
                in_q = None
        elif ch in ("'", '"'):
            cur += ch
            in_q = ch
        elif ch == "(":
            depth += 1
            cur += ch
        elif ch == ")":
            depth -= 1
            cur += ch
        elif ch == "," and depth == 0:
            out.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        out.append(cur)
    return out


@dataclass
class RemoteTable:
    """A table living on a remote engine (reference RemoteTable,
    src/sql/table.rs:50-53)."""

    ref: RemoteTableRef
    schema: Any = None                      # pyspark StructType or None
    # per-table rewrite hooks (reference src/sql/table.rs:33-45)
    logical_optimizer: Optional[Callable] = None   # plan -> plan (schema-stable)
    ast_analyzer: Optional[Callable] = None        # sql str -> sql str (AST stage)
    sql_query_rewriter: Optional[Callable] = None  # final sql str -> str

    @classmethod
    def named(cls, name: str, schema=None, **hooks) -> "RemoteTable":
        return cls(ref=RemoteTableRef.parse(name), schema=schema, **hooks)


@dataclass
class TableHandle:
    """Registry entry binding a local Spark-visible name to a provider and
    its remote table (FederatedTableProviderAdaptor analog, reference
    src/table_provider.rs:21-124). ``fallback_path`` is the local parquet
    path used when the provider is the local Spark engine (or as the
    adaptor's fallback provider)."""

    local_name: str
    provider: Any                          # FederationProvider
    remote: Optional[RemoteTable] = None
    fallback_path: Optional[str] = None
    schema: Any = None
    #: Spark data-source name for fallback_path reads/writes —
    #: "parquet" historically, "orc" for register_local_orc
    fallback_format: str = "parquet"

    def remote_sql_ref(self, dialect) -> str:
        """How this table is spelled inside generated remote SQL. The local
        name -> remote name rewrite (RewriteTableScanAnalyzer analog,
        src/sql/analyzer.rs:24-111) is trivial here because handles carry
        the remote reference from registration time (SURVEY.md §2B)."""
        if self.remote is not None:
            return self.remote.ref.to_sql(dialect)
        return dialect.quote_table(self.local_name)
