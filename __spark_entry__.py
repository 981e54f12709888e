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

from datafusion_federation_spark.queries import REGISTRY
import datafusion_federation_spark.queries_pipeline  # noqa: F401 (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: federated pushdown join (orders+customer on a DuckDB
    remote collapse to one SQL; schema-cast back into Spark)."""
    fn, _ = REGISTRY["q50_federated_pushdown"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in REGISTRY.items()
            if sql is not None}
