"""Skew mitigation helpers for 100 TB-scale shuffles.

AQE's skew-join splitting handles joins at runtime; these helpers cover
the cases AQE does not: aggregation hot keys (one key owning a double-
digit share of the data serializes into one reducer) and broadcast-less
joins against a replicable small side.

All rewrites are exact: salted two-phase aggregation only works for
algebraic aggregates (partial results merge associatively), which is
enforced by construction.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: aggregate -> (partial fn, merge fn) for the two phases
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_aggregate(df: DataFrame, keys: Sequence[str],
                     aggs: Dict[str, Tuple[str, str]],
                     n_salt: int = 32) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (agg_name, input_column) with agg_name
    in {sum, count, min, max, avg}. Phase 1 groups by (keys..., salt) so
    a hot key spreads over ``n_salt`` reducers; phase 2 merges the
    partials per key. avg is decomposed into sum+count so both phases
    stay algebraic.

    Equivalent to ``df.groupBy(keys).agg(...)`` for any data; worth the
    second (tiny) shuffle only when a key is hot enough to serialize a
    reducer.
    """
    plan: Dict[str, Tuple[str, str]] = {}
    avg_parts: Dict[str, Tuple[str, str]] = {}
    for out, (name, col) in aggs.items():
        if name == "avg":
            plan[f"__{out}_sum"] = ("sum", col)
            plan[f"__{out}_cnt"] = ("count", col)
            avg_parts[out] = (f"__{out}_sum", f"__{out}_cnt")
        elif name in _ALGEBRAIC:
            plan[out] = (name, col)
        else:
            raise ValueError(
                f"{name} is not algebraic; salting would change results")

    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*[
        _ALGEBRAIC[name][0](col).alias(out)
        for out, (name, col) in plan.items()])
    final = partial.groupBy(*keys).agg(*[
        _ALGEBRAIC[name][1](out).alias(out)
        for out, (name, col) in plan.items()])
    for out, (s, c) in avg_parts.items():
        final = final.withColumn(out, F.col(s) / F.col(c))
    drop = [c for c in final.columns if c.startswith("__")]
    return final.drop(*drop)


def two_phase_sessionization(events: DataFrame, user_col: str = "user_id",
                             ts_col: str = "ts", gap_ms: int = 1800000,
                             chunk: str = "1 day") -> DataFrame:
    """Per-user session counts without a single per-user window — the
    scale path for sessionization when one hot user would serialize into
    one task.

    Phase 1 windows over (user, time-chunk): a chunk is the salt, so a
    hot user's events spread across as many tasks as they span chunks.
    Sessions are exact within a chunk; only each chunk's FIRST event is
    uncertain (its predecessor lives in the previous chunk). Phase 2
    fixes exactly that with a window over the per-(user, chunk)
    aggregates — thousands of times smaller — subtracting one session
    for every chunk boundary whose gap is within the threshold.

    Returns (user_col, n_sessions, n_events); exactly equal to the
    single-window LAG formulation (tested against q42).
    """
    from pyspark.sql import Window as W
    ts_ms = F.unix_millis(F.col(ts_col))
    chunked = events.withColumn(
        "__chunk", F.window(F.col(ts_col), chunk)["start"])
    intra = W.partitionBy(user_col, "__chunk").orderBy(ts_ms)
    gap = ts_ms - F.lag(ts_ms).over(intra)
    per_event = chunked.withColumn(
        "__new_sess",
        F.when(gap.isNull() | (gap > gap_ms), 1).otherwise(0))
    per_chunk = (per_event.groupBy(user_col, "__chunk")
                 .agg(F.sum("__new_sess").alias("__n_sess"),
                      F.count(F.lit(1)).alias("__n_events"),
                      F.min(ts_ms).alias("__first_ts"),
                      F.max(ts_ms).alias("__last_ts")))
    by_user = W.partitionBy(user_col).orderBy("__chunk")
    boundary_gap = (F.col("__first_ts")
                    - F.lag("__last_ts").over(by_user))
    merged = per_chunk.withColumn(
        "__merge", F.when(boundary_gap <= gap_ms, 1).otherwise(0))
    return (merged.groupBy(user_col)
            .agg((F.sum("__n_sess") - F.sum("__merge"))
                 .cast("bigint").alias("n_sessions"),
                 F.sum("__n_events").cast("bigint").alias("n_events")))


def salted_join(skewed: DataFrame, small: DataFrame, key: str,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Join a skewed large side against a replicable smaller side without
    broadcasting: the skewed side gets a random salt, the small side is
    replicated once per salt value, and the join key becomes
    (key, salt) — a hot key's rows spread over ``n_salt`` tasks.

    Use when the small side is too big to broadcast but cheap to
    replicate n_salt times; exact for inner/left joins on the skewed
    side."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join preserves only the skewed side: "
                         "inner or left")
    salted = skewed.withColumn(
        "__salt", (F.rand(seed=42) * n_salt).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    out = salted.join(replicated, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", order_cols: Sequence[str] = (),
               gap_ms: int = 1800000, hot_user_threshold: int = 0,
               sample_fraction: float = 0.01,
               chunk: str = "1 day") -> DataFrame:
    """Sessionization front door: single-window LAG form by default, the
    exact two-phase salted form (``two_phase_sessionization``) when a
    hot user is detected.

    ``hot_user_threshold`` <= 0 disables detection (always simple).
    Otherwise a seeded sample of the user column estimates the max
    per-user event count (one column-pruned job — cheap relative to the
    session window itself); if the scaled estimate exceeds the
    threshold, the per-user window would serialize a multi-million-row
    task and the chunk-salted form runs instead. Both forms return
    (user_col, n_sessions, n_events) and are tested equal.
    """
    use_two_phase = False
    if hot_user_threshold > 0:
        est = (events.select(user_col)
               .sample(fraction=sample_fraction, seed=42)
               .groupBy(user_col).count()
               .agg(F.max("count").alias("m")).collect()[0]["m"])
        est_max = (est or 0) / sample_fraction
        use_two_phase = est_max > hot_user_threshold
    if use_two_phase:
        return two_phase_sessionization(events, user_col, ts_col,
                                        gap_ms, chunk)
    from pyspark.sql import Window as W
    w = W.partitionBy(user_col).orderBy(ts_col, *order_cols)
    ts_ms = F.unix_millis(F.col(ts_col))
    gap = ts_ms - F.lag(ts_ms).over(w)
    return (events.withColumn("__new_sess",
                              F.when(gap > gap_ms, 1).otherwise(0))
            .groupBy(user_col)
            .agg((1 + F.sum("__new_sess")).cast("bigint")
                 .alias("n_sessions"),
                 F.count(F.lit(1)).alias("n_events")))
