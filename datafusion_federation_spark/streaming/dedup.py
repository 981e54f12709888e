"""Streaming deduplication: exactly-once keyed dedup over an event
stream, the ingestion-side twin of the batch dedup operators
(operators/dedup.py).

``dropDuplicates`` on the stream keeps one state row per distinct key
and suppresses every later arrival — the classic at-least-once ->
exactly-once repair in front of downstream aggregation. Without a
watermark the state never evicts, which makes the operator EXACTLY
equal to batch DISTINCT (the d47 oracle pins this); that is the right
configuration for bounded backfills (availableNow). An unbounded
production stream must bound state with
``dropDuplicatesWithinWatermark`` instead, accepting that a duplicate
arriving later than the watermark delay re-emits — a documented
relaxation, not an option here because it would make the oracle
equality hold only probabilistically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_touch_counts(events: DataFrame) -> DataFrame:
    """Distinct users per event type, streaming form: keyed dedup on
    (user_id, event_type) — each user counts once per type, however
    many times they fire it — then a running count per type.

    Which physical row survives the dedup is arrival-order dependent;
    everything downstream uses only the KEY columns, so the result is
    deterministic and equals ``COUNT(DISTINCT user_id) GROUP BY
    event_type`` on the same data.

    State sizing: one state row per (user, type) for the dedup + one
    per type for the count — key cardinality, not event volume.
    """
    return (events
            .dropDuplicates(["user_id", "event_type"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_users")))
