"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on sf0.001 (smoke).
queries()      -> name -> (spark, sf_dir) -> DataFrame, one per implemented
                  operator (SURVEY.md §2 + north-star extensions).
oracle_sql()   -> name -> DuckDB SQL equivalent (omitted for
                  non-SQL-expressible ops: engine-specific hash signatures).

Implementation lives in datafusion_federation_spark.queries[_pipeline];
this module only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_federation_spark.queries import REGISTRY, SECONDARY
import datafusion_federation_spark.queries_pipeline  # noqa: F401 (registers)
import datafusion_federation_spark.queries_tpch  # noqa: F401 (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: federated pushdown join (orders+customer on a DuckDB
    remote collapse to one SQL; schema-cast back into Spark)."""
    fn, _ = REGISTRY["q50_federated_pushdown"]
    return fn(spark, "/root/testdata/sf0.001")


def _ordered_names() -> list[str]:
    """Primaries first (plain q's, then the d-suite, then the q50+
    engine-path suite), secondaries last. The driver's correctness file
    records a window of the first 50 entries; the 50 primaries are
    exactly the set whose operator has no other recorded evidence."""
    import re

    def qnum(n):
        m = re.match(r"q(\d+)", n)
        return int(m.group(1)) if m else None

    names = list(REGISTRY)
    prim = [n for n in names if n not in SECONDARY]
    # numeric parse, NOT string compare: 'q100_x' < 'q50' lexically
    # would misfile future 3-digit queries into the plain suite
    plain = [n for n in prim if qnum(n) is not None and qnum(n) < 50]
    dsuite = [n for n in prim if n.startswith("d")]
    engine = [n for n in prim if qnum(n) is not None and qnum(n) >= 50]
    other = [n for n in prim if n not in set(plain + dsuite + engine)]
    sec = [n for n in names if n in SECONDARY]
    return plain + dsuite + engine + other + sec


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name][0] for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {name: REGISTRY[name][1] for name in _ordered_names()
            if REGISTRY[name][1] is not None}
