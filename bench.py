"""Benchmark harness: time every registered query at the bench scale
factor and print ONE machine-readable JSON line.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)

Output (single line on stdout, everything else on stderr):
  {"metric": "total_query_seconds", "value": <sum>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("federation_bench")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    # warmup: initialize executor threads, codegen, and the parquet
    # reader path so the first timed query doesn't pay JVM startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    per_query = {}
    failures = {}
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            # noop sink: materializes EVERY column of every row (count()
            # lets Catalyst prune computed projections entirely, timing
            # little more than the scan for projection-only queries)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            per_query[name] = round(dt, 3)
            log(f"bench {name}: {dt:.2f}s")
        except Exception as e:  # noqa: BLE001 - record and continue
            failures[name] = str(e)[:200]
            log(f"bench {name}: FAILED {str(e)[:200]}")

    out = {
        "metric": "total_query_seconds",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
    }
    if failures:
        # a crashed query must not read as a speedup: surface the count
        # in the headline object and exit nonzero so the driver flags it
        out["failures"] = failures
        out["failed"] = len(failures)
    print(json.dumps(out), flush=True)
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
