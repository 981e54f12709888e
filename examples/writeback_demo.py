"""Federated write-back (r12): DML statements that execute ENTIRELY on
the remote engine — the SELECT unparses to the remote dialect and only
the statement string crosses, never rows. The pattern a 100 TB
deployment wants for same-engine materialization: CTAS a summary table,
trim it with DELETE, adjust it with UPDATE, extend it with INSERT — all
four without moving data through Spark.

Run: python examples/writeback_demo.py [testdata_dir]
"""

from __future__ import annotations

import sys


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    from datafusion_federation_spark import (
        DuckDBExecutor, FederationEngine, SQLProvider)

    duck = DuckDBExecutor(name="duck", compute_context="wb_demo")
    duck.register_parquet("orders", f"{sf_dir}/orders.parquet")
    duck.register_parquet("customer", f"{sf_dir}/customer.parquet")

    eng = FederationEngine(spark)
    prov = SQLProvider(duck)
    eng.register_remote(prov, "orders")
    eng.register_remote(prov, "customer")

    # 1. CTAS: the summary table is BUILT inside DuckDB (and becomes
    #    immediately queryable through federation)
    n = eng.sql("""
        CREATE TABLE segment_stats AS
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2)
                    AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment""")
    print(f"CTAS built {n} rows remotely")
    print("remote stmt:", duck.metrics()["last_sql"][:72], "...")

    # 2. DELETE: trim small segments, predicate unparsed to DuckDB
    deleted = eng.sql("DELETE FROM segment_stats WHERE n_orders < 5")
    print(f"DELETE removed {deleted} rows remotely")

    # 3. UPDATE: adjust a column in place
    updated = eng.sql(
        "UPDATE segment_stats SET revenue = revenue * 1.1 "
        "WHERE segment = 'BUILDING'")
    print(f"UPDATE touched {updated} rows remotely")

    # 4. INSERT ... SELECT: extend from the same engine's data
    inserted = eng.sql("""
        INSERT INTO segment_stats
        SELECT 'ALL' AS segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(0 AS DOUBLE) AS revenue
        FROM orders""")
    print(f"INSERT added {inserted} rows remotely")

    rows = eng.sql("SELECT segment, n_orders, revenue "
                   "FROM segment_stats ORDER BY segment").collect()
    for r in rows:
        print(tuple(r))
    return rows


if __name__ == "__main__":
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    main(spark, sys.argv[1] if len(sys.argv) > 1
         else "/root/testdata/sf0.001")
    spark.stop()
