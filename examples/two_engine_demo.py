"""Two remote engines + local Spark in one query (the PySpark analog of
the reference's examples/df-csv-advanced.rs): orders live on DuckDB,
a priority dimension lives on SQLite, lineitem is local parquet. The
federation pass sends each engine ONE SQL statement and Spark joins the
results.

Run: python examples/two_engine_demo.py [testdata_dir]
"""

from __future__ import annotations

import sys


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    from datafusion_federation_spark import (
        DuckDBExecutor, FederationEngine, SQLiteExecutor, SQLProvider)

    duck = DuckDBExecutor(name="duck", compute_context="demo")
    duck.register_parquet("orders", f"{sf_dir}/orders.parquet")

    lite = SQLiteExecutor(name="lite", compute_context="demo")
    lite.load_rows(
        "priority_dim",
        "CREATE TABLE priority_dim (prio TEXT, weight INTEGER)",
        [("1-URGENT", 5), ("2-HIGH", 4), ("3-MEDIUM", 3),
         ("4-NOT SPECIFIED", 2), ("5-LOW", 1)])

    eng = FederationEngine(spark)
    eng.register_remote(SQLProvider(duck), "orders")
    eng.register_remote(SQLProvider(lite), "priority_dim")
    eng.register_local_parquet("lineitem", f"{sf_dir}/lineitem.parquet")

    df = eng.sql("""
        SELECT p.weight, COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS total
        FROM orders o
        JOIN priority_dim p ON o.o_orderpriority = p.prio
        WHERE o.o_totalprice > 50000
        GROUP BY p.weight ORDER BY p.weight DESC""")
    rows = df.collect()
    print("duck SQL :", duck.metrics()["last_sql"])
    print("lite SQL :", lite.metrics()["last_sql"])
    for r in rows:
        print(tuple(r))
    return rows


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    main(spark, sys.argv[1] if len(sys.argv) > 1 else
         "/root/testdata/sf0.001")
