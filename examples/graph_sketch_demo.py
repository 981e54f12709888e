"""Graph + sketch analytics on the events fixture (round-7 operators):

  co-purchase graph -> PageRank (dangling-mass) -> triangle counts ->
  label-propagation communities -> k-core nucleus, with HLL / KMV
  sketch cardinalities alongside exact counts.

Every stage is deterministic (md5-register sketches, fixed-round
iterations, ordered tie-breaks) — rerunning prints identical numbers.

Run: python examples/graph_sketch_demo.py [testdata_dir]
"""

from __future__ import annotations

import sys


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    from pyspark.sql import functions as F

    from datafusion_federation_spark.operators import sketches
    from datafusion_federation_spark.operators.graph import (
        kcore_prune, label_propagation, pagerank, triangle_counts)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.floor(F.unix_timestamp(F.col("ts").cast("timestamp"))
                         / 3600).cast("long").alias("hb"), "user_id")
         .distinct())
    edges = (p.alias("a").join(
        p.alias("b"),
        (F.col("a.hb") == F.col("b.hb"))
        & (F.col("a.user_id") < F.col("b.user_id")))
        .select(F.col("a.user_id").alias("src"),
                F.col("b.user_id").alias("dst")))
    n_edges = edges.count()
    print(f"co-purchase graph: {n_edges} edges")

    top = (pagerank(edges, iters=5, dangling=True)
           .orderBy(F.col("rank").desc(), "node").limit(3).collect())
    print("pagerank top-3:",
          [(r.node, round(r.rank, 5)) for r in top])

    tri = (triangle_counts(edges)
           .orderBy(F.col("triangles").desc(), "node").limit(3)
           .collect())
    print("triangle top-3:", [(r.node, r.triangles) for r in tri])

    comms = (label_propagation(edges, iters=3)
             .groupBy("label").count()
             .orderBy(F.col("count").desc(), "label").limit(3)
             .collect())
    print("largest communities:", [(r.label, r["count"]) for r in comms])

    n_core = kcore_prune(edges, k=3, rounds=3).count()
    print("3-core nodes after 3 rounds:", n_core)

    # sketch vs exact cardinality, per event type
    exact = dict(ev.groupBy("event_type")
                 .agg(F.countDistinct("user_id")).collect())
    hll = {r.event_type: r.est
           for r in sketches.hll_distinct(ev, "user_id",
                                          ["event_type"], p=6,
                                          correct_small=True).collect()}
    kmv = {r.event_type: r.est
           for r in sketches.kmv_distinct(ev, "user_id",
                                          ["event_type"],
                                          k=64).collect()}
    for et in sorted(exact):
        print(f"{et}: exact={exact[et]} hll={hll[et]} kmv={kmv[et]}")
    return {"n_edges": n_edges, "n_core": n_core,
            "pagerank_top": [(r.node, r.rank) for r in top],
            "exact": exact, "hll": hll, "kmv": kmv}


if __name__ == "__main__":
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("graph_sketch_demo")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    main(spark, sys.argv[1] if len(sys.argv) > 1 else
         "/root/testdata/sf0.001")
    spark.stop()
