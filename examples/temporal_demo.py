"""Event-time analytics flow on the events fixture:

  as-of attribution (purchase -> latest prior click) ->
  trailing 7-day revenue per user (RANGE frame) ->
  hourly gapfill with LOCF ->
  audience overlap between event types from stored KMV sketches

Every stage is a composition of built-in DataFrame ops — one keyed
shuffle each, no joins in the as-of path, no quadratic strategies
anywhere (tests/test_temporal_plans.py pins the shapes).

Run: python examples/temporal_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(spark=None, sf_dir: str = SF_DIR):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    own_session = spark is None
    if own_session:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("temporal_demo")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")

    from datafusion_federation_spark.operators import temporal
    from datafusion_federation_spark.operators.sketches import (
        kmv_partials, kmv_set_estimates)
    from datafusion_federation_spark.queries import t

    e = t(spark, sf_dir, "events")

    # 1. as-of attribution: purchases to the latest prior click
    clicks = (e.filter(F.col("event_type") == "click")
              .groupBy("user_id", "ts")
              .agg(F.max("event_id").alias("click_id")))
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id"))
    attributed = temporal.asof_join(purchases, clicks, on=["user_id"],
                                    left_ts="ts", right_ts="ts")
    # one pass for both counts — a second .count() re-runs the join
    n_total, n_attr = attributed.agg(
        F.count(F.lit(1)), F.count("click_id")).collect()[0]
    print(f"attribution: {n_attr}/{n_total} purchases have "
          "a prior click")

    # 1b. the hot-key scale path: same attribution, windows per
    # (user, 6h slice) with chunk-level carry injection — results are
    # exactly the single-window form's (r6)
    sliced = temporal.asof_join(purchases, clicks, on=["user_id"],
                                left_ts="ts", right_ts="ts",
                                slice_s=6 * 3600)
    n_sliced = sliced.agg(F.count("click_id")).collect()[0][0]
    assert n_sliced == n_attr, "sliced arm must equal single-window"
    print(f"hot-key sliced arm: identical ({n_sliced} attributed)")

    # 2. trailing 7-day revenue per user (event-time RANGE frame)
    daily = (e.filter(F.col("event_type") == "purchase")
             .groupBy("user_id",
                      temporal.time_bucket(F.col("ts"), 86400)
                      .alias("day"))
             .agg(F.sum(F.col("value").cast("decimal(12,2)"))
                  .alias("rev")))
    w = W.partitionBy("user_id").orderBy("day").rangeBetween(-6, 0)
    trailing = daily.withColumn("rev_7d", F.sum("rev").over(w))
    top = (trailing.orderBy(F.desc("rev_7d"), "user_id", "day")
           .limit(3).collect())
    print("top trailing-7d windows:",
          [(r.user_id, int(r.day), float(r.rev_7d)) for r in top])

    # 3. hourly purchase totals, gap hours zero-filled / carried
    hourly = (e.filter(F.col("event_type") == "purchase")
              .groupBy(temporal.time_bucket(F.col("ts"), 3600)
                       .alias("hb"))
              .agg(F.count(F.lit(1)).alias("n")))
    dense = temporal.time_bucket_gapfill(
        hourly.withColumn("g", F.lit(1)), keys=["g"], bucket_col="hb",
        zero_cols=["n"])
    n_dense, gaps = dense.agg(
        F.count(F.lit(1)),
        F.sum((F.col("n") == 0).cast("int"))).collect()[0]
    print(f"gapfill: {n_dense} dense hours, {gaps} were gaps")

    # 4. audience overlap from sketches alone (no raw re-read)
    def sketch(kind):
        return kmv_partials(
            e.filter(F.col("event_type") == kind)
            .select(F.lit(1).alias("g"), "user_id"),
            "user_id", ["g"], k=64)

    est = kmv_set_estimates(sketch("click"), sketch("purchase"),
                            ["g"], k=64).collect()[0]
    print(f"click vs purchase audiences: union~{est.union_est} "
          f"intersection~{est.intersect_est}")

    if own_session:
        spark.stop()
    return n_attr


if __name__ == "__main__":
    main()
