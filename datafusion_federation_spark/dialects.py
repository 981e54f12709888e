"""SQL dialects for the unparser.

The reference delegates unparsing to DataFusion's ``Unparser::new(dialect)``
with per-executor dialects ('sqlite', 'postgres', 'flight' are named —
reference src/sql/mod.rs:229-232, src/sql/executor.rs:32-33). We own the
equivalent here: quoting, literal syntax, LIMIT/OFFSET form, ILIKE/regex
support, scalar-function name mapping, and type names.
"""

from __future__ import annotations

import datetime as _dt
import re as _re
from typing import Any, Dict, Optional, Sequence


class UnsupportedUnparse(ValueError):
    """This dialect cannot express the construct (no syntax for it, or
    translating it would change semantics). The federation pass catches
    this and compiles the enclosing subtree locally instead of shipping
    wrong SQL — mirroring DataFusion's posture of only claiming plans
    its unparser supports. Genuine contract violations (double
    federation, malformed plans) stay plain ValueError and do NOT
    degrade."""


#: Java SimpleDateFormat tokens (the Spark canonical format language) ->
#: per-engine format tokens. Longest-match scan; untranslatable alpha
#: tokens raise so a wrong format never ships silently.
_STRFTIME_FMT = {"yyyy": "%Y", "yy": "%y", "MM": "%m", "dd": "%d",
                 "HH": "%H", "hh": "%I", "mm": "%M", "ss": "%S"}
_MYSQL_FMT = {"yyyy": "%Y", "yy": "%y", "MM": "%m", "dd": "%d",
              "HH": "%H", "hh": "%h", "mm": "%i", "ss": "%s"}
_PG_FMT = {"yyyy": "YYYY", "yy": "YY", "MM": "MM", "dd": "DD",
           "HH": "HH24", "hh": "HH12", "mm": "MI", "ss": "SS"}


def translate_time_format(fmt: str, mapping: Dict[str, str]) -> str:
    """Translate a Java SimpleDateFormat pattern (Spark's canonical
    format language: yyyy-MM-dd HH:mm:ss) into the target engine's
    tokens. Raises on alpha tokens with no mapping — shipping an
    untranslated pattern would silently produce wrong strings."""
    out, i, toks = [], 0, sorted(mapping, key=len, reverse=True)
    while i < len(fmt):
        for t in toks:
            if fmt.startswith(t, i):
                out.append(mapping[t])
                i += len(t)
                break
        else:
            ch = fmt[i]
            if ch.isalpha():
                raise UnsupportedUnparse(
                    f"cannot translate format token {ch!r} in {fmt!r}")
            if ch == "%" and any(v.startswith("%") for v in
                                 mapping.values()):
                out.append("%%")      # literal % in strftime-style targets
            else:
                out.append(ch)
            i += 1
    return "".join(out)


def _fmt_literal(arg_sql: str, mapping: Dict[str, str]) -> str:
    """Translate a RENDERED format-string literal ('yyyy-MM-dd' with the
    quotes on). Non-literal format expressions cannot be translated at
    plan time — refuse rather than mistranslate."""
    if not (arg_sql.startswith("'") and arg_sql.endswith("'")):
        raise UnsupportedUnparse(
            f"format argument must be a string literal to translate "
            f"for this dialect, got {arg_sql}")
    return "'" + translate_time_format(arg_sql[1:-1], mapping) + "'"


def _unit_of(arg_sql: str) -> str:
    """Lower-cased unit from a rendered literal like 'MONTH'."""
    return arg_sql.strip().strip("'").lower()


class Dialect:
    name = "ansi"
    quote_char = '"'
    ilike_op = "ILIKE"               # dialects without ILIKE override
    #: FROM clause for a one-row, zero-column relation (FROM-less
    #: SELECT). None = the engine accepts SELECT without FROM
    #: (DuckDB/Postgres/SQLite/MySQL/Spark); engines that require a
    #: dummy table override (Derby: SYSIBM.SYSDUMMY1). r12, used by
    #: the scanless write-back unparse.
    one_row_from: Optional[str] = None
    #: CTAS capability gates (r12 write-back): whether the engine
    #: spells CREATE OR REPLACE TABLE, and whether CTAS-with-data is
    #: unavailable (Derby: only AS ... WITH NO DATA, so the engine
    #: runs CREATE + INSERT as two statements)
    supports_create_or_replace = False
    ctas_needs_no_data = False
    supports_filter_clause = True    # FILTER (WHERE ...) on aggregates
    #: scalar function specs: canonical (Spark) name -> one of
    #:   str without braces  — plain rename: "substr"
    #:   str with braces     — template over rendered args:
    #:                         "strpos({1}, {0})"
    #:   callable(args)->str — full control (format translation,
    #:                         unit dispatch)
    function_map: Dict[str, Any] = {}
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
        if isinstance(v, (bytes, bytearray)):
            # binary literal (r13, live-PG insert passthrough):
            # ANSI/DuckDB/MySQL spell X'hex'; PostgreSQL overrides
            # with the bytea hex-string form
            return self.binary_literal(bytes(v))
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, _dt.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        if isinstance(v, _dt.date):
            return f"DATE '{v.isoformat()}'"
        if isinstance(v, (int, float)):
            return repr(v)
        import decimal as _dec
        if isinstance(v, _dec.Decimal):
            return str(v)
        if isinstance(v, (list, tuple)):
            return "(" + ", ".join(self.literal(x) for x in v) + ")"
        raise ValueError(f"cannot render literal {v!r}")

    def binary_literal(self, b: bytes) -> str:
        return "X'" + b.hex() + "'"


    def type_name(self, spark_type: str) -> str:
        t = spark_type.strip().lower()
        if t.startswith("decimal"):
            return t.upper()
        return self.type_map.get(t, spark_type.upper())

    def scalar_function(self, name: str, args: Sequence[str]) -> str:
        spec = self.function_map.get(name.lower())
        if spec is None:
            return f"{name}({', '.join(args)})"
        if callable(spec):
            return spec(list(args))
        if "{" in spec:
            # str.format silently DROPS surplus arguments — a 3-arg
            # locate(sub, s, pos) rendered through "strpos({1}, {0})"
            # would lose the start position and return wrong rows
            idx = [int(m) for m in _re.findall(r"\{(\d+)\}", spec)]
            need = max(idx) + 1 if idx else 0
            if len(args) != need:
                raise UnsupportedUnparse(
                    f"{name}() with {len(args)} args has no "
                    f"{self.name} translation (template takes {need})")
            return spec.format(*args)
        return f"{spec}({', '.join(args)})"

    def concat_op(self, left: str, right: str) -> str:
        """The || operator (MySQL needs CONCAT: || is logical OR there)."""
        return f"({left} || {right})"

    def agg_function(self, name: str) -> str:
        spec = self.function_map.get(name.lower())
        if isinstance(spec, str) and "{" not in spec:
            return spec.upper()
        return name.upper()

    def regex_match(self, expr: str, pattern: str, negated: bool) -> str:
        s = f"REGEXP_MATCHES({expr}, {pattern})"
        return f"(NOT {s})" if negated else s

    def distinct_predicate(self, a: str, b: str, negated: bool) -> str:
        """IS [NOT] DISTINCT FROM (null-safe comparison, total —
        never NULL). Standard spelling; engines without it override
        (MySQL <=>, Derby a total AND/OR/IS NULL expansion)."""
        return f"{a} IS {'NOT ' if negated else ''}DISTINCT FROM {b}"

    #: whether the engine has native SEMI/ANTI JOIN syntax; when False the
    #: unparser rewrites semi/anti joins to (NOT) EXISTS
    supports_semi_anti_join = False
    supports_asof_join = False       # native ASOF JOIN syntax
    supports_frame_exclude = False   # SQL:2011 frame EXCLUDE clause
    supports_groups_frame = False    # SQL:2011 GROUPS frame mode
    supports_within_group = False    # ordered-set aggregate syntax
    supports_window_distinct_agg = False  # COUNT(DISTINCT x) OVER (...)
    #: ANSI `FETCH FIRST n ROWS WITH TIES` (DuckDB / Postgres 13+);
    #: engines without it get the local boundary-probe lowering
    supports_fetch_with_ties = False
    #: in-call ordered aggregates: `string_agg(x, sep ORDER BY k)`.
    #: DuckDB/Postgres spell it; MySQL (GROUP_CONCAT ... SEPARATOR),
    #: Derby, and Spark SQL do not — shipping it anyway fails with a
    #: remote engine error instead of the refuse-at-unparse/compile-
    #: locally posture (ADVICE r7). False keeps the subtree local via
    #: AggFunc._ordered_agg_spark.
    supports_agg_order_by = False

    #: window null-treatment syntax: "postfix" = `f(x) IGNORE NULLS OVER`
    #: (SQL:2011, Spark), "inline" = `f(x IGNORE NULLS) OVER` (DuckDB),
    #: None = no syntax (Postgres/SQLite/MySQL/Derby) — WindowFunc.to_sql
    #: raises UnsupportedUnparse so the subtree compiles locally
    ignore_nulls_style: Any = "postfix"

    #: keyword for `SELECT * <kw> (cols)` column exclusion — DuckDB spells
    #: it EXCLUDE, Spark/Databricks/BigQuery spell it EXCEPT; None means
    #: the engine has no such syntax and the unparser must expand the star
    #: into an explicit column list (or refuse when columns are unknown)
    star_exclude_kw: Any = None
    #: whether the engine supports `SELECT * REPLACE (expr AS col)`.
    #: The base (ansi) dialect renders it optimistically — it is our
    #: canonical display syntax; engines known to reject it get expansion.
    supports_star_replace = True

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


def _sqlite_date_trunc(args):
    unit = _unit_of(args[0])
    if unit == "day":
        return f"date({args[1]})"
    starts = {"year": "start of year", "month": "start of month"}
    if unit not in starts:
        raise UnsupportedUnparse(
            f"sqlite date_trunc cannot express unit {unit!r}")
    return f"date({args[1]}, '{starts[unit]}')"


def _mysql_date_trunc(args):
    unit = _unit_of(args[0])
    forms = {"year": "DATE_FORMAT({0}, '%Y-01-01')",
             "month": "DATE_FORMAT({0}, '%Y-%m-01')",
             "day": "DATE({0})"}
    if unit not in forms:
        raise UnsupportedUnparse(
            f"mysql date_trunc cannot express unit {unit!r}")
    return forms[unit].format(args[1])


def _sqlite_no_builtin(name):
    """Refusal spec for functions sqlite simply does not have — the
    default passthrough would ship them verbatim and fail at the
    remote instead of keeping the expression local (r12)."""
    def f(args):
        raise UnsupportedUnparse(
            f"sqlite has no {name}() built-in — compiled locally")
    return f


def _sqlite_part(token):
    """SQLite date parts go through strftime + int cast (no year()/
    month()/... functions)."""
    return lambda a: f"CAST(strftime('{token}', {a[0]}) AS INTEGER)"


def _log_fn(a):
    """Spark log(x) is the NATURAL log; log(b, x) is base-b. The ln-ratio
    form is exact in double on every engine (Postgres' native log(b,x)
    is numeric-only; DuckDB's log(x) is log10)."""
    if len(a) == 1:
        return f"ln({a[0]})"
    if len(a) == 2:
        return f"(ln({a[1]}) / ln({a[0]}))"
    raise UnsupportedUnparse("log() takes 1 or 2 arguments")


def _pg_extract(field):
    return lambda a: f"CAST(EXTRACT({field} FROM {a[0]}) AS INTEGER)"


class DuckDBDialect(Dialect):
    name = "duckdb"
    supports_create_or_replace = True  # CREATE OR REPLACE TABLE (r12)
    supports_semi_anti_join = True  # native SEMI JOIN / ANTI JOIN
    supports_asof_join = True       # native ASOF [LEFT] JOIN
    supports_frame_exclude = True   # EXCLUDE CURRENT ROW/GROUP/TIES
    supports_within_group = True    # percentile_cont/disc, mode
    supports_window_distinct_agg = True   # DISTINCT aggs run windowed
    supports_agg_order_by = True    # string_agg(x, sep ORDER BY k)
    # NO FETCH ... WITH TIES: DuckDB's parser rejects the clause
    # (probed v1.x: "syntax error at or near WITH") — local lowering
    ignore_nulls_style = "inline"   # f(x IGNORE NULLS) OVER (...)
    star_exclude_kw = "EXCLUDE"     # SELECT * EXCLUDE (a, b)
    supports_star_replace = True    # SELECT * REPLACE (x*2 AS x)
    function_map = {
        # Spark canonical -> DuckDB. date_trunc / year / month / day /
        # hour / minute / second / substring / instr / concat / trim
        # family are native under the same names.
        "substr": "substring",
        "locate": "strpos({1}, {0})",          # locate(sub, s) arg swap
        "dayofmonth": "day",
        "dayofweek": "dayofweek",
        "weekofyear": "weekofyear",
        # Spark date_format(ts, javafmt) -> strftime(ts, cfmt)
        "date_format":
            lambda a: f"strftime({a[0]}, {_fmt_literal(a[1], _STRFTIME_FMT)})",
        "log": _log_fn,                        # Spark log(x) is natural
        "power": "pow",
        "current_timestamp": lambda a: "now()",
    }


class PostgresDialect(Dialect):
    name = "postgres"
    # r13 (caught by LIVE execution of the surface sweep on a real
    # PG 15): PostgreSQL has no DOUBLE or TINYINT — CAST(x AS DOUBLE)
    # errors `type "double" does not exist` on the engine. FLOAT maps
    # to REAL (Spark float = 4 bytes; bare PG FLOAT is float8).
    type_map = dict(Dialect.type_map, double="DOUBLE PRECISION",
                    byte="SMALLINT", float="REAL")

    def binary_literal(self, b: bytes) -> str:
        # bytea hex input format (implicitly cast in INSERT contexts)
        return "'\\x" + b.hex() + "'"
    supports_star_replace = False  # no * REPLACE/EXCLUDE syntax
    ignore_nulls_style = None      # no IGNORE NULLS syntax
    supports_frame_exclude = True  # EXCLUDE clause since PG 11
    supports_groups_frame = True   # GROUPS mode since PG 11
    supports_within_group = True   # ordered-set aggregates (PG 9.4+)
    supports_agg_order_by = True   # string_agg(x, sep ORDER BY k)
    supports_fetch_with_ties = True  # WITH TIES since PG 13
    function_map = {
        "year": _pg_extract("YEAR"), "quarter": _pg_extract("QUARTER"),
        "month": _pg_extract("MONTH"), "day": _pg_extract("DAY"),
        "dayofmonth": _pg_extract("DAY"),
        "hour": _pg_extract("HOUR"), "minute": _pg_extract("MINUTE"),
        "second": _pg_extract("SECOND"),
        "date_format":
            lambda a: f"to_char({a[0]}, {_fmt_literal(a[1], _PG_FMT)})",
        "instr": "strpos({0}, {1})",
        "locate": "strpos({1}, {0})",
        "log": _log_fn,
    }

    def regex_match(self, expr, pattern, negated):
        op = "!~" if negated else "~"
        return f"{expr} {op} {pattern}"


class SQLiteDialect(Dialect):
    name = "sqlite"
    supports_star_replace = False  # no * REPLACE/EXCLUDE syntax
    ignore_nulls_style = None      # no IGNORE NULLS syntax
    supports_frame_exclude = True  # EXCLUDE clause since 3.28
    supports_groups_frame = True   # GROUPS mode since 3.28
    quote_char = '"'
    ilike_op = "LIKE"  # sqlite LIKE is case-insensitive for ASCII already
    supports_filter_clause = True
    type_map = dict(Dialect.type_map, string="TEXT", double="REAL",
                    long="INTEGER", bigint="INTEGER")
    function_map = {
        "year": _sqlite_part("%Y"), "month": _sqlite_part("%m"),
        "day": _sqlite_part("%d"), "dayofmonth": _sqlite_part("%d"),
        "hour": _sqlite_part("%H"), "minute": _sqlite_part("%M"),
        "second": _sqlite_part("%S"),
        "date_trunc": _sqlite_date_trunc,
        # sqlite strftime(format, time) — note the flipped arg order
        "date_format":
            lambda a: f"strftime({_fmt_literal(a[1], _STRFTIME_FMT)}, {a[0]})",
        "substring": "substr",
        "locate": "instr({1}, {0})",           # instr(haystack, needle)
        # concat() only exists in very recent sqlite; || is universal and
        # NULL-propagating like Spark's concat
        "concat": lambda a: "(" + " || ".join(a) + ")",
        "power": "pow",
        "pow": "pow",
        "log": _log_fn,
        # r12: sqlite ships NO hash built-ins — the default passthrough
        # rendered md5(x) verbatim and the claim died at execution with
        # an sqlite error instead of degrading to a local compile (the
        # posture every other capability gate takes). Also gates the
        # deterministic hash-sample pushdown.
        "md5": _sqlite_no_builtin("md5"),
        "sha1": _sqlite_no_builtin("sha1"),
        "sha2": _sqlite_no_builtin("sha2"),
        "xxhash64": _sqlite_no_builtin("xxhash64"),
    }

    def regex_match(self, expr, pattern, negated):
        s = f"{expr} REGEXP {pattern}"
        return f"(NOT {s})" if negated else s


class SparkSQLDialect(Dialect):
    """Unparse back to Spark SQL (for a second SparkSession as the remote,
    or for EXPLAIN display)."""

    name = "spark"
    quote_char = "`"
    supports_lambda = True          # higher-order `x -> body` syntax
    supports_semi_anti_join = True  # LEFT SEMI / LEFT ANTI JOIN
    supports_within_group = True    # percentile_cont/disc (3.4+), mode
    star_exclude_kw = "EXCEPT"      # SELECT * EXCEPT (a, b), Spark >= 3.4
    supports_star_replace = False   # open-source Spark has no * REPLACE
    join_keywords = dict(Dialect.join_keywords,
                         semi="LEFT SEMI JOIN", anti="LEFT ANTI JOIN")

    def regex_match(self, expr, pattern, negated):
        s = f"{expr} RLIKE {pattern}"
        return f"(NOT {s})" if negated else s

    def type_name(self, spark_type: str) -> str:
        return spark_type.upper()


class MySQLDialect(Dialect):
    name = "mysql"
    supports_star_replace = False  # no * REPLACE/EXCLUDE syntax
    ignore_nulls_style = None      # no IGNORE NULLS syntax
    quote_char = "`"
    ilike_op = "LIKE"  # MySQL LIKE is case-insensitive by default collation
    supports_filter_clause = False
    # r12 (caught pinning the sample-predicate golden): MySQL's CAST
    # accepts CHAR, not VARCHAR — CAST(x AS VARCHAR) is a syntax error
    # there. SIGNED/DOUBLE likewise replace the unsupported INT/BIGINT
    # cast targets.
    type_map = dict(Dialect.type_map, string="CHAR",
                    int="SIGNED", integer="SIGNED", long="SIGNED",
                    bigint="SIGNED", short="SIGNED", byte="SIGNED",
                    float="DOUBLE",
                    timestamp="DATETIME")  # TIMESTAMP isn't a MySQL
                                           # cast target; DATETIME is
    function_map = {
        # year/month/day/hour/minute/second/instr/locate/substring are
        # native MySQL; log(x) is already the natural log
        "date_trunc": _mysql_date_trunc,
        "date_format":
            lambda a: f"DATE_FORMAT({a[0]}, {_fmt_literal(a[1], _MYSQL_FMT)})",
        "ln": "ln",
    }

    def concat_op(self, left: str, right: str) -> str:
        # MySQL || is logical OR under default sql_mode
        return f"CONCAT({left}, {right})"

    def limit_clause(self, fetch, skip) -> str:
        # MySQL has no bare OFFSET; the documented idiom is a huge LIMIT
        if fetch is None and skip is not None:
            return f"LIMIT 18446744073709551615 OFFSET {skip}"
        return super().limit_clause(fetch, skip)

    def regex_match(self, expr, pattern, negated):
        s = f"{expr} REGEXP {pattern}"
        return f"(NOT {s})" if negated else s

    def distinct_predicate(self, a, b, negated):
        # MySQL spells null-safe equality <=>; no DISTINCT FROM syntax
        s = f"({a} <=> {b})"
        return s if negated else f"(NOT {s})"


class DerbyDialect(Dialect):
    """Apache Derby (the pure-Java embedded engine Spark already ships
    for its Hive metastore) — the live-JDBC integration target: a real
    DriverManager/JDBC round-trip with zero extra jars. Conservative
    surface: constructs Derby cannot run raise UnsupportedUnparse, so
    federation vetting keeps them local instead of shipping bad SQL."""

    name = "derby"
    one_row_from = "SYSIBM.SYSDUMMY1"  # Derby refuses FROM-less SELECT
    ctas_needs_no_data = True   # only CREATE TABLE AS ... WITH NO DATA
    supports_star_replace = False   # no * REPLACE/EXCLUDE syntax
    ignore_nulls_style = None       # no IGNORE NULLS syntax
    supports_filter_clause = False  # no FILTER (WHERE ...) on aggregates
    # CAST to unbounded VARCHAR is a syntax error in Derby: every string
    # cast needs an explicit length (32672 is Derby's VARCHAR maximum)
    type_map = dict(Dialect.type_map, string="VARCHAR(32672)")
    function_map = {
        # year/month/day/hour/minute/second/locate/substr/mod are native
        "ln": "ln",
        "log": _log_fn,
    }

    #: Derby's actual built-in scalar functions (Derby 10.x reference,
    #: "Built-in functions") — the base class renders UNMAPPED names
    #: verbatim, which for Derby's tiny surface shipped SQL it cannot
    #: run (round(), power(), date_format() all vetted clean and then
    #: failed at JDBC execution — review r5). Anything outside this
    #: whitelist or function_map now refuses, so federation vetting
    #: compiles it locally, matching the class contract above.
    #: NOTE "char" is deliberately ABSENT: Spark's char(65) is the
    #: chr() code-point function while Derby's CHAR(65) is a string
    #: cast returning '65' — same name, different data (review r5)
    _NATIVE = frozenset({
        "abs", "acos", "asin", "atan", "atan2", "bigint", "ceil",
        "ceiling", "coalesce", "cos", "cosh", "cot", "date",
        "day", "degrees", "double", "exp", "floor", "hour", "integer",
        "lcase", "length", "ln", "locate", "log10", "lower", "ltrim",
        "minute", "mod", "month", "nullif", "pi", "radians", "rtrim",
        "second", "sign", "sin", "sinh", "smallint", "sqrt", "substr",
        "tan", "tanh", "time", "timestamp", "trim", "ucase", "upper",
        "varchar", "year",
    })

    def scalar_function(self, name: str, args: Sequence[str]) -> str:
        if (name.lower() not in self.function_map
                and name.lower() not in self._NATIVE):
            raise UnsupportedUnparse(
                f"derby has no {name}() built-in — compiled locally")
        return super().scalar_function(name, args)

    @property
    def ilike_op(self):
        # Derby LIKE is case-sensitive and there is no ILIKE; raising
        # here (instead of silently degrading to LIKE) makes the
        # federation pass compile case-insensitive matches locally
        raise UnsupportedUnparse(
            "derby has no case-insensitive LIKE (ILIKE)")

    def limit_clause(self, fetch, skip) -> str:
        # Derby has no LIMIT/OFFSET keywords; it uses the SQL-standard
        # OFFSET ... ROWS / FETCH FIRST ... ROWS ONLY forms
        parts = []
        if skip is not None:
            parts.append(f"OFFSET {skip} ROWS")
        if fetch is not None:
            parts.append(f"FETCH FIRST {fetch} ROWS ONLY")
        return " ".join(parts)

    def regex_match(self, expr, pattern, negated):
        raise UnsupportedUnparse("derby has no regex operator")

    def distinct_predicate(self, a, b, negated):
        # Derby (10.x) has neither DISTINCT FROM nor <=>: expand to a
        # TOTAL predicate (never NULL — each disjunct pins both
        # nullities, so no UNKNOWN can leak into a projected value)
        if negated:  # null-safe equal
            return (f"((({a} = {b}) AND {a} IS NOT NULL "
                    f"AND {b} IS NOT NULL) "
                    f"OR ({a} IS NULL AND {b} IS NULL))")
        return (f"((({a} <> {b}) AND {a} IS NOT NULL "
                f"AND {b} IS NOT NULL) "
                f"OR ({a} IS NULL AND {b} IS NOT NULL) "
                f"OR ({a} IS NOT NULL AND {b} IS NULL))")


DIALECTS = {d.name: d for d in
            (Dialect(), DuckDBDialect(), PostgresDialect(), SQLiteDialect(),
             SparkSQLDialect(), MySQLDialect(), DerbyDialect())}


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
