"""Plan-level output-schema inference (the DFSchema analog).

The reference wraps EVERY VirtualExecutionPlan in a SchemaCastScanExec
built from the claimed logical plan's own DFSchema
(datafusion-federation/src/sql/mod.rs:143-161), so federated results
always come back in the types the plan declares — regardless of how
weakly the remote engine types its wire results (SQLite affinity,
empty result sets, stringly CSV engines).

DataFusion gets that schema from its expression type-propagation rules.
Our Spark-first analog delegates the propagation to Catalyst itself:
compile the claimed sub-plan against EMPTY local DataFrames bearing each
scan's registered schema, and read the analyzed output ``StructType``.
This is analysis-only — no Spark job runs on an empty frame until an
action is called, and we never call one — yet it yields exact Spark
semantics for the whole expression surface with zero hand-written type
rules.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Optional

#: (id(spark), cache_key) -> StructType. The unparsed SQL of a claimed
#: plan fully determines its output schema for a given provider, so
#: repeated claims of the same query (interactive re-runs, test suites)
#: skip the Catalyst analysis round-trips entirely.
_CACHE: dict = {}
_CACHE_MAX = 1024


def infer_plan_schema(spark, plan, cache_key: Optional[str] = None
                      ) -> Optional[Any]:
    """Best-effort output schema of a plan. Returns a pyspark StructType,
    or None when inference is impossible (a scan with no registered
    schema, or a construct the local compiler refuses)."""
    if cache_key is not None:
        # applicationId, not id(spark): a torn-down session's address can
        # be reused by a new allocation, which would serve stale schemas
        try:
            app = spark.sparkContext.applicationId
        except Exception:
            app = id(spark)
        full_key = (app, cache_key)
    else:
        full_key = None
    if full_key is not None and full_key in _CACHE:
        return _CACHE[full_key]
    try:
        with _quiet_analysis_errors(spark):
            schema = _ShellCompiler(spark).compile(plan).schema
    except Exception:
        return None
    if full_key is not None:
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.clear()
        _CACHE[full_key] = schema
    return schema


@contextmanager
def _quiet_analysis_errors(spark):
    """Silence PySpark's query-context error loggers for the duration
    of a probe whose failure is EXPECTED (remote-only functions like
    DuckDB's string_split fail Catalyst analysis by design; the caller
    returns None and the query proceeds federated). PySpark 4 logs
    every captured AnalysisException as a full ERROR-level JSON stack
    trace through the plain-Python loggers below
    (pyspark/errors/exceptions/base.py:_log_exception) — an operational
    page magnet when it fires on a healthy path at scale."""
    import logging

    names = ("SQLQueryContextLogger", "DataFrameQueryContextLogger")
    # create THROUGH PySpark's factory: a plain logging.getLogger here
    # would REGISTER these names as stdlib Loggers first, and the
    # stdlib manager hands back the existing instance forever after —
    # PySpark's later kwarg-style calls (log.error(..., file=...))
    # then TypeError and MASK the real AnalysisException (review r5,
    # reproduced: every analysis error after one probe surfaced as
    # "Logger._log() got an unexpected keyword argument 'file'")
    try:
        from pyspark.logger import PySparkLogger
        loggers = [PySparkLogger.getLogger(n) for n in names]
    except ImportError:  # pragma: no cover - older pyspark
        loggers = [logging.getLogger(n) for n in names]
    prev = [lg.level for lg in loggers]
    for lg in loggers:
        lg.setLevel(logging.CRITICAL)
    try:
        yield
    finally:
        for lg, lv in zip(loggers, prev):
            lg.setLevel(lv)


def _shell_schema(handle, spark):
    """Schema for a scan leaf: the registered one, else the file
    footer for local tables, read in the handle's OWN format (review
    r7: this was the one fallback_path reader not updated for ORC —
    a degraded-registration ORC table would have been footer-read as
    parquet here). Memoized on the handle."""
    if handle.schema is not None:
        return handle.schema
    if handle.fallback_path is not None:
        handle.schema = (spark.read
                         .format(getattr(handle, "fallback_format",
                                         "parquet"))
                         .load(handle.fallback_path).schema)
        return handle.schema
    raise ValueError(f"no schema registered for {handle.local_name!r}")


class _ShellCompiler:
    """Compiler façade that substitutes every leaf with an empty
    DataFrame of the leaf's declared schema, then reuses the real
    Compiler for everything above the leaves (so inference and
    execution can never diverge on operator semantics)."""

    def __init__(self, spark):
        from .compiler import Compiler

        class _Shell(Compiler):
            def _c(inner, p):  # noqa: N805 - nested subclass
                from .plans.nodes import RemoteQueryNode, Scan
                if isinstance(p, Scan):
                    from .sources.provider import empty_dataframe
                    schema = _shell_schema(p.table, inner.spark)
                    df = empty_dataframe(inner.spark, schema)
                    if p.projection:
                        df = df.select(*p.projection)
                    return df.alias(p.table.local_name)
                if isinstance(p, RemoteQueryNode):
                    if p.schema is None:
                        raise ValueError(
                            "nested federated node without schema")
                    from .sources.provider import empty_dataframe
                    return empty_dataframe(inner.spark, p.schema)
                return super()._c(p)

        self._compiler = _Shell(spark, runtime_join_filters=False)

    def compile(self, plan):
        return self._compiler.compile(plan)
