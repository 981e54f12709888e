"""SQL dialects for the unparser.

The reference delegates unparsing to DataFusion's ``Unparser::new(dialect)``
with per-executor dialects ('sqlite', 'postgres', 'flight' are named —
reference src/sql/mod.rs:229-232, src/sql/executor.rs:32-33). We own the
equivalent here: quoting, literal syntax, LIMIT/OFFSET form, ILIKE/regex
support, scalar-function name mapping, and type names.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Dict, Sequence


class Dialect:
    name = "ansi"
    quote_char = '"'
    ilike_op = "ILIKE"               # dialects without ILIKE override
    supports_filter_clause = True    # FILTER (WHERE ...) on aggregates
    #: scalar function renames: our canonical name -> dialect name
    function_map: Dict[str, str] = {}
    #: Spark type name -> dialect type name
    type_map: Dict[str, str] = {
        "string": "VARCHAR", "long": "BIGINT", "bigint": "BIGINT",
        "int": "INTEGER", "integer": "INTEGER", "short": "SMALLINT",
        "byte": "TINYINT", "double": "DOUBLE", "float": "REAL",
        "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
    }

    def quote(self, ident: str) -> str:
        q = self.quote_char
        return f"{q}{ident.replace(q, q + q)}{q}"

    def quote_table(self, name: str) -> str:
        """Quote a possibly multipart (1-3 part) table name
        (RemoteTableRef semantics, reference src/sql/table_reference.rs)."""
        return ".".join(self.quote(p) for p in split_table_name(name))

    def literal(self, v: Any) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, _dt.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, _dt.date):
            return f"DATE '{v.isoformat()}'"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "(" + ", ".join(self.literal(x) for x in v) + ")"
        raise ValueError(f"cannot render literal {v!r}")

    def type_name(self, spark_type: str) -> str:
        t = spark_type.strip().lower()
        if t.startswith("decimal"):
            return t.upper()
        return self.type_map.get(t, spark_type.upper())

    def scalar_function(self, name: str, args: Sequence[str]) -> str:
        name = self.function_map.get(name.lower(), name)
        return f"{name}({', '.join(args)})"

    def agg_function(self, name: str) -> str:
        return self.function_map.get(name.lower(), name).upper()

    def regex_match(self, expr: str, pattern: str, negated: bool) -> str:
        s = f"REGEXP_MATCHES({expr}, {pattern})"
        return f"(NOT {s})" if negated else s

    #: whether the engine has native SEMI/ANTI JOIN syntax; when False the
    #: unparser rewrites semi/anti joins to (NOT) EXISTS
    supports_semi_anti_join = False

    #: join keywords; semi/anti spellings vary per engine
    join_keywords = {
        "inner": "JOIN", "left": "LEFT JOIN", "right": "RIGHT JOIN",
        "full": "FULL JOIN", "cross": "CROSS JOIN",
        "semi": "SEMI JOIN", "anti": "ANTI JOIN",
    }

    def join_keyword(self, how: str) -> str:
        return self.join_keywords[how]

    def limit_clause(self, fetch, skip) -> str:
        # zero values render too: LIMIT 0 / OFFSET 0 are preserved, they
        # do not vanish (reference regression, src/sql/analyzer.rs:73-94)
        parts = []
        if fetch is not None:
            parts.append(f"LIMIT {fetch}")
        if skip is not None:
            parts.append(f"OFFSET {skip}")
        return " ".join(parts)


class DuckDBDialect(Dialect):
    name = "duckdb"
    supports_semi_anti_join = True  # native SEMI JOIN / ANTI JOIN
    function_map = {
        # Spark canonical -> DuckDB
        "substring": "substr",
        "locate": "strpos",
        "dayofmonth": "dayofmonth",
        "date_format": "strftime",
        "to_timestamp": "CAST",  # handled via CAST in practice
    }


class PostgresDialect(Dialect):
    name = "postgres"

    def regex_match(self, expr, pattern, negated):
        op = "!~" if negated else "~"
        return f"{expr} {op} {pattern}"


class SQLiteDialect(Dialect):
    name = "sqlite"
    quote_char = '"'
    ilike_op = "LIKE"  # sqlite LIKE is case-insensitive for ASCII already
    supports_filter_clause = True
    type_map = dict(Dialect.type_map, string="TEXT", double="REAL",
                    long="INTEGER", bigint="INTEGER")

    def regex_match(self, expr, pattern, negated):
        s = f"{expr} REGEXP {pattern}"
        return f"(NOT {s})" if negated else s


class SparkSQLDialect(Dialect):
    """Unparse back to Spark SQL (for a second SparkSession as the remote,
    or for EXPLAIN display)."""

    name = "spark"
    quote_char = "`"
    supports_semi_anti_join = True  # LEFT SEMI / LEFT ANTI JOIN
    join_keywords = dict(Dialect.join_keywords,
                         semi="LEFT SEMI JOIN", anti="LEFT ANTI JOIN")

    def regex_match(self, expr, pattern, negated):
        s = f"{expr} RLIKE {pattern}"
        return f"(NOT {s})" if negated else s

    def type_name(self, spark_type: str) -> str:
        return spark_type.upper()


class MySQLDialect(Dialect):
    name = "mysql"
    quote_char = "`"
    ilike_op = "LIKE"  # MySQL LIKE is case-insensitive by default collation
    supports_filter_clause = False

    def limit_clause(self, fetch, skip) -> str:
        # MySQL has no bare OFFSET; the documented idiom is a huge LIMIT
        if fetch is None and skip is not None:
            return f"LIMIT 18446744073709551615 OFFSET {skip}"
        return super().limit_clause(fetch, skip)

    def regex_match(self, expr, pattern, negated):
        s = f"{expr} REGEXP {pattern}"
        return f"(NOT {s})" if negated else s


DIALECTS = {d.name: d for d in
            (Dialect(), DuckDBDialect(), PostgresDialect(), SQLiteDialect(),
             SparkSQLDialect(), MySQLDialect())}


def get_dialect(name) -> Dialect:
    if isinstance(name, Dialect):
        return name
    try:
        return DIALECTS[name]
    except KeyError:
        raise ValueError(f"unknown dialect {name!r}; have {sorted(DIALECTS)}")


def split_table_name(name: str):
    """Split a 1-3 part table name respecting quoted parts
    (RemoteTableRef parser analog, reference src/sql/table_reference.rs:29-101).
    """
    parts, cur, in_q, qc = [], "", False, None
    i = 0
    while i < len(name):
        ch = name[i]
        if in_q:
            if ch == qc:
                if i + 1 < len(name) and name[i + 1] == qc:  # escaped quote
                    cur += ch
                    i += 1
                else:
                    in_q = False
            else:
                cur += ch
        elif ch in ('"', "`"):
            in_q, qc = True, ch
        elif ch == ".":
            parts.append(cur)
            cur = ""
        else:
            cur += ch
        i += 1
    parts.append(cur)
    if not 1 <= len(parts) <= 3:
        raise ValueError(f"table name {name!r} has {len(parts)} parts (max 3)")
    return parts
