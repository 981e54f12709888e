"""Streaming joins over the events stream.

- stream_static_enrich: stream x static-dimension join — Spark
  broadcasts the dim per micro-batch; no stream state at all.
- view_to_purchase_attribution: STREAM-STREAM interval join (each
  purchase matched to the same user's views in the preceding window).
  Both sides carry watermarks and the join condition bounds event time
  on both ends, so the state store provably evicts: a view older than
  (watermark + window) can never match a future purchase.

Like windows.py, every function works identically on batch frames, so
exactness is testable against a plain batch join; the streaming path is
exercised with file sources in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         key: str = "user_id") -> DataFrame:
    """Enrich a (possibly streaming) events frame with a STATIC
    dimension. Spark plans this as a broadcast join per micro-batch —
    stateless, watermark-free, the cheapest join a stream can do."""
    return events.join(F.broadcast(dim), on=key, how="left")


def view_to_purchase_attribution(events: DataFrame,
                                 window: str = "30 minutes",
                                 watermark: str = "1 hour") -> DataFrame:
    """Attribute each purchase to the same user's views within the
    preceding `window` (classic last-touch shape): a STREAM-STREAM inner
    join with event-time bounds on both inputs.

    State: both sides are watermarked and the condition bounds
    view.ts in (purchase.ts - window, purchase.ts], so the state store
    keeps only `watermark + window` of either stream regardless of run
    length — the property that makes stream-stream joins viable at
    100 TB/day. Output: one row per (purchase, matching view)."""
    is_stream = events.isStreaming
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"))
    if is_stream:
        views = views.withWatermark("v_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    lo = F.col("p_ts") - F.expr(f"INTERVAL {window}")
    cond = ((F.col("v_user") == F.col("p_user"))
            & (F.col("v_ts") > lo)
            & (F.col("v_ts") <= F.col("p_ts")))
    return (views.join(purchases, on=cond, how="inner")
            .select(F.col("p_user").alias("user_id"),
                    "purchase_id", "view_id",
                    F.col("p_ts").alias("purchase_ts"),
                    F.col("v_ts").alias("view_ts"),
                    "purchase_value"))
