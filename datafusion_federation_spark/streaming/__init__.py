"""Structured Streaming surface.

The reference is strictly batch (``Boundedness::Bounded`` hard-coded,
datafusion-federation/src/sql/mod.rs:179) — this package is a north-star
extension: the same event-table aggregations as the batch queries
(q40-q42), expressed as Structured Streaming plans with watermarks, so a
user can point the engine at a live stream instead of parquet and keep
the semantics.
"""

from .stateful import running_totals, streaming_dedup
from .windows import (
    hourly_event_aggregation,
    sessionize_stream,
    sliding_event_counts,
)

__all__ = [
    "hourly_event_aggregation",
    "running_totals",
    "sessionize_stream",
    "sliding_event_counts",
    "streaming_dedup",
]
