"""Streaming windowed aggregations over the events stream.

Each function takes a (possibly streaming) DataFrame with the events
schema (ts timestamp, user_id long, event_type string, value double) and
returns a transformed DataFrame. They work identically on batch frames —
the batch queries q40/q42 are the same plans — so correctness is testable
without a streaming source, and the streaming path is exercised with a
file/memory source in tests.

Scale notes:
- tumbling/sliding windows shuffle on (window, group key); watermarks
  bound state so a 100 TB/day stream holds only the open windows.
- sessionization uses F.session_window (native state store) rather than
  a giant per-user window function; state is per (user, open session).
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def hourly_event_aggregation(events: DataFrame,
                             watermark: str = "2 hours",
                             event_types=("purchase", "click")
                             ) -> DataFrame:
    """Tumbling 1-hour count + value sum per event type (the streaming
    form of q40). Late events beyond `watermark` are dropped; closed
    windows emit finalized rows in append mode."""
    e = events.filter(F.col("event_type").isin(*event_types))
    if events.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast(DEC)), 2)
                 .cast("double").alias("total_value"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:00")
                    .alias("hour"), "event_type", "n", "total_value"))


def sliding_event_counts(events: DataFrame,
                         window: str = "1 hour",
                         slide: str = "15 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Sliding-window event counts per type — each event lands in
    window/slide overlapping windows."""
    e = events
    if events.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.window("ts", window, slide).alias("w"),
                      "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm")
                    .alias("w_start"),
                    F.date_format("w.end", "yyyy-MM-dd HH:mm")
                    .alias("w_end"),
                    "event_type", "n"))


def sessionize_stream(events: DataFrame,
                      gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap — the
    streaming form of q42's LAG-based batch sessionization. State lives
    in the state store keyed by (user_id, open session); the watermark
    finalizes sessions.

    Boundary semantics match the batch form exactly: session_window
    merges an event landing ON the window end (inclusive), so a gap of
    exactly 30:00.000000 stays one session — same as the batch LAG
    form's `gap_ms > 1800000` split test (pinned in
    test_session_boundary_gap_matches_batch)."""
    e = events
    if events.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (e.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast(DEC)), 2)
                 .cast("double").alias("session_value"))
            .select("user_id",
                    F.date_format("s.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    F.date_format("s.end", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_end"),
                    "n_events", "session_value"))
