"""Federation over Arrow Flight (the reference's 'flight' executor
dialect): an in-process Flight server fronts a DuckDB database; the
engine discovers its tables over gRPC and ships ONE SQL statement per
federated subtree.

Run: python examples/flight_demo.py [testdata_dir]
"""

from __future__ import annotations

import sys


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    import duckdb

    from datafusion_federation_spark import (
        FederationEngine, FlightSQLExecutor, SQLProvider)
    from datafusion_federation_spark.sources.flight_server import (
        DuckDBFlightServer)

    conn = duckdb.connect()
    for t in ("orders", "customer"):
        conn.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"read_parquet('{sf_dir}/{t}.parquet')")

    # the package's reusable in-process server (shared with the live
    # tests and the q77 oracle row)
    server = DuckDBFlightServer(conn)
    try:
        ex = FlightSQLExecutor(f"grpc://127.0.0.1:{server.port}",
                               name="flight_demo", dialect="duckdb")
        eng = FederationEngine(spark)
        eng.discover(SQLProvider(ex))
        df = eng.sql("""
            SELECT c_mktsegment, COUNT(*) AS n FROM orders
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY n DESC""")
        rows = df.collect()
        print("flight SQL:", ex.metrics()["last_sql"])
        for r in rows:
            print(tuple(r))
        return rows
    finally:
        server.shutdown()


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    main(spark, sys.argv[1] if len(sys.argv) > 1 else
         "/root/testdata/sf0.001")
