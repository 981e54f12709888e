#!/usr/bin/env python
"""A/B bench for session-config and code experiments (optimization
round; guide §1): run a subset of registered queries in a fresh session
with extra --conf overrides, two passes, report per-query minima.

Usage:
    python tools/bench_ab.py [sf_dir] [q1,q2,... | ALL | TOP] \
        [k1=v1,k2=v2,...]

Prints one JSON line: {"queries": {...}, "total": ..., "conf": {...}}.
Runs in-process (one JVM); invoke once per config variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

TOP = ("d65_jaccard_prefix,d51_pagerank,d68_pagerank_dangling,"
       "d05_simhash,d24_minhash_md5,d04_minhash_lsh,d83_span_dedup,"
       "d38_embedding_dedup,d34_stream_attribution,q88_recursive_cte,"
       "d30_repetition_stats,d16_dup_clusters,q112_cycle_union_distinct,"
       "d28_decontaminate,q18_large_orders,q119_multikey_pivot,"
       "d26_winnow_md5,d08_embedding_near_pairs,d85_stream_cm,"
       "q107_minmax_frame_exclude,d33_incremental_dedup,d76_hll_distinct,"
       "q89_recursive_union_all,d53_countmin_heavy_hitters,d84_lm_fluency,"
       "d88_stream_hist,h08_market_share,d03_ngram_jaccard,"
       "d80_label_propagation,q19_distinct_filter_agg,d32_stream_sessions,"
       "d81_kcore,d62_bloom_join_prune,d75_stream_last_n,h09_product_profit,"
       "d12_winnow_fingerprint,d97_png_complete_decode,d99_jpeg_progressive_decode,"
       "q01_pricing_summary,q10_top_customers,h21_waiting_supplier,"
       "d40_asof_attribution,d66_dense_index,d19_quota_per_group,"
       "q23_case_when,q51_local_nop_provider,d46_kmv_distinct,"
       "d87_scd2_snapshot,q103_lead_lag,d56_zorder_layout")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "TOP"
    conf = {}
    if len(sys.argv) > 3 and sys.argv[3]:
        for kv in sys.argv[3].split(","):
            k, v = kv.split("=", 1)
            conf[k] = v
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    b = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("bench_ab")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g"))
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entrymod
    registry = entrymod.queries()
    if which == "TOP":
        names = TOP.split(",")
    elif which == "ALL":
        names = list(registry)
    else:
        names = which.split(",")

    # warmup (mirrors bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int") \
        .mapInPandas(lambda it: it, "x int").count()

    per = {}
    errs = {}
    for pno in (1, 2):
        for name in names:
            fn = registry[name][0] if isinstance(registry[name], tuple) \
                else registry[name]
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                per.setdefault(name, []).append(round(dt, 3))
                print(f"p{pno} {name}: {dt:.2f}s", file=sys.stderr,
                      flush=True)
            except Exception as e:  # noqa: BLE001
                errs[name] = str(e)[:200]
                print(f"p{pno} {name}: FAILED {str(e)[:200]}",
                      file=sys.stderr, flush=True)
    mins = {n: min(v) for n, v in per.items() if v}
    out = {"total": round(sum(mins.values()), 2), "n": len(mins),
           "queries": mins, "conf": conf,
           "loadavg": round(os.getloadavg()[0], 1)}
    if errs:
        out["errors"] = errs
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
