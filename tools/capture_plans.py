#!/usr/bin/env python
"""Capture .explain("formatted") for every registered query into
plans/<outdir>/<name>_<tag>.txt, plus a summary line per query with
plan-shape stats (Exchange count, join strategies, Python eval nodes,
plan-build wall time). Driver-side only — nothing is executed, so the
capture is load-insensitive (the optimization-round measurement recipe,
guide §1).

Usage:
    python tools/capture_plans.py <outdir> <tag> [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    outdir = sys.argv[1]
    tag = sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    registry = entrymod.queries()
    if names:
        registry = {n: registry[n] for n in names}

    stats = {}
    for name, fn in registry.items():
        t0 = time.time()
        try:
            df = fn(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 - record and continue
            stats[name] = {"err": str(e)[:200]}
            print(f"{name}: ERR {str(e)[:120]}", file=sys.stderr)
            continue
        build_s = round(time.time() - t0, 3)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        st = {
            "build_s": build_s,
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "bnl": plan.count("BroadcastNestedLoopJoin"),
            "cart": plan.count("CartesianProduct"),
            "pyeval": (plan.count("BatchEvalPython")
                       + plan.count("ArrowEvalPython")
                       + plan.count("MapInPandas")
                       + plan.count("MapInArrow")
                       + plan.count("FlatMapGroupsInPandas")),
            "window": plan.count("Window"),
            "sort": len(re.findall(r"\bSort\b", plan)),
            "scans": plan.count("Scan parquet"),
            "lines": plan.count("\n"),
        }
        stats[name] = st
        print(f"{name}: build {build_s}s ex={st['exchanges']} "
              f"smj={st['smj']} bhj={st['bhj']} py={st['pyeval']} "
              f"lines={st['lines']}", file=sys.stderr)
    with open(os.path.join(outdir, f"_summary_{tag}.json"), "w") as f:
        json.dump(stats, f, indent=1, sort_keys=True)
    print(json.dumps({"captured": len(stats)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
