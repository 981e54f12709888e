"""Temporal join and time-series operators: as-of join, point-in-interval
(range) join, and time-bucket gap-filling with LOCF.

North-star extension beyond the reference surface (the reference
federates these to engines that have them — e.g. DuckDB's ASOF JOIN;
here they are first-class distributed operators). All three are built
from DataFrame primitives only — no Python in the row path — and each
shuffles exactly once on the join/group key:

- ``asof_join``: the classic "latest right row at-or-before each left
  row" join (market-data enrichment, attribution). Implemented WITHOUT a
  join at all: union both sides tagged, one window sort per key, carry
  the right payload forward (``last(..., ignorenulls=True)``). One hash
  shuffle on the key columns; the in-partition sort is the same work a
  sort-merge join would do, but no probe-side buffering and no
  non-equi-condition fallback to broadcast-nested-loop — which is what
  Spark itself plans for the naive ``l.ts >= r.ts`` formulation.
- ``point_in_interval_join``: events-to-intervals containment. The naive
  predicate join is non-equi (BNL at scale); instead both sides are
  bucketed on a caller-chosen time grid: points land in exactly one
  bucket, intervals explode to every bucket they cover, and the match
  becomes an equi-join on (keys..., bucket) + an exact residual filter.
  Each (point, interval) pair meets in exactly one bucket — the point's
  own — so no post-join dedup is needed.
- ``time_bucket_gapfill``: dense per-key time series from sparse
  aggregates (TimescaleDB's time_bucket_gapfill): per-key bucket range,
  ``sequence``-explode the gaps, left-join the aggregates back, then
  zero-fill and/or LOCF (last observation carried forward) per column.

100 TB notes: all three partition by the entity key. A pathologically
hot key (one user with billions of rows) serializes its window sort;
``asof_join(slice_s=...)`` is the implemented scale path (r6) — window
per (key, time chunk) with cross-chunk carry rows injected from
chunk-level aggregates, results exactly preserved (the single-key
window form stays the correctness anchor the sliced arm is
property-tested against).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: carried right-side columns are prefixed in the union frame so they can
#: never collide with left columns; stripped before returning.
_R = "__asof_r_"


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str = "ts", right_ts: Optional[str] = None,
              direction: str = "backward",
              tolerance_s: Optional[float] = None,
              suffix: str = "_right",
              slice_s: Optional[int] = None) -> DataFrame:
    """For each left row, attach the single right row with the nearest
    ``right_ts`` at-or-before (``backward``), at-or-after
    (``forward``), or closest in either direction with ties to the
    earlier row (``nearest``, pandas ``merge_asof`` semantics),
    matching on the ``on`` key columns. Unmatched left rows keep NULL
    right columns (left outer semantics, like DuckDB's ``ASOF LEFT
    JOIN`` / pandas ``merge_asof``). ``nearest`` computes both carries
    in the same window pass — still one Exchange, no second shuffle.

    ``tolerance_s`` (seconds) nulls the match when the time gap exceeds
    it, pandas-style. For ``nearest`` this is applied AFTER picking the
    nearer side — equivalent to pandas' filter-then-pick because both
    gaps are nonnegative: if the picked (nearer) side exceeds the
    tolerance the farther side does too, so no in-tolerance candidate
    is ever discarded (ADVICE r5 suspected this corner; pinned
    equivalent against real pandas merge_asof in test_temporal.py).
    Right payload columns that collide with a left
    column name get ``suffix`` appended; the right timestamp is always
    returned as ``right_ts + suffix``.

    Right rows must be unique per (keys..., right_ts) — duplicates make
    "the" as-of row ambiguous (engines with native ASOF pick one
    arbitrarily); pre-aggregate (e.g. max payload per instant) first so
    results are deterministic.

    Plan shape: Union -> one Exchange on ``on`` -> Sort -> Window ->
    Filter. No Join node at all — the naive ``l.k = r.k AND l.ts >=
    r.ts`` + row_number formulation Spark would otherwise plan buffers
    every (left, earlier-right) pair before pruning; this form carries
    one value per column instead.

    ``slice_s`` (opt-in, seconds) is the hot-key scale path (VERDICT r5
    item 5): a pathologically hot key (one entity, billions of rows)
    serializes the per-key window sort. Slicing chunks time into
    ``slice_s``-wide buckets and windows per (key, chunk) instead —
    bounded partitions — after replicating each chunk's cross-chunk
    carry row into the chunk (the last right row from earlier chunks
    for ``backward``; the first from later chunks for ``forward``;
    both for ``nearest``). The carry rows are computed on CHUNK-LEVEL
    aggregates (one row per (key, chunk), ~range/slice_s rows per key),
    never on the row-level data, so no task ever sorts a hot key's full
    history. Results are EXACTLY the single-window form's (equality
    property-tested in test_temporal.py): a left row's true match is
    either inside its own chunk or IS the injected carry row, whose
    real timestamp rides along so tolerance still measures true gaps.
    Pick ``slice_s`` so a hot key's densest slice fits a task —
    same sizing judgement as point_in_interval_join's grid.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")
    if slice_s is not None:
        return _asof_join_sliced(left, right, list(on), left_ts,
                                 right_ts, direction, tolerance_s,
                                 suffix, slice_s)
    keys = list(on)
    rts = right_ts or left_ts
    payload = [c for c in right.columns if c not in keys and c != rts]
    reserved = [c for c in list(left.columns) + list(right.columns)
                if c in ("_asof_t", "_asof_side") or c.startswith(_R)]
    if reserved:
        raise ValueError(
            f"input uses asof_join's reserved column names {reserved}; "
            "rename before joining")
    # the suffixed OUTPUT names must not collide with left columns
    # either (a left column literally named 'ts_right' would duplicate)
    out_names = [c + suffix if (c in left.columns or c == rts) else c
                 for c in [rts] + payload]
    clash = sorted(set(out_names) & set(left.columns))
    if clash or len(set(out_names)) != len(out_names):
        raise ValueError(
            f"asof_join output names {clash or out_names} collide with "
            f"left columns under suffix {suffix!r}; rename or pick "
            "another suffix")

    # union frame: left keeps all its columns; right contributes its
    # timestamp + payload as ONE struct under a reserved name. The
    # struct is non-NULL exactly on right rows, so last(ignorenulls)
    # carries whole right ROWS: a NULL inside a payload column stays
    # the matched row's NULL instead of resurrecting an older right
    # row's value, and two payload columns can never mix values from
    # different right rows (the per-column carry did both — seventh
    # review, r5, caught by the scd2->asof composition test). Sides
    # are tagged so ties at the same instant order
    # right-at-or-before-left (backward) / left-before-right (forward),
    # making the >= / <= bounds inclusive. "nearest" reuses the
    # backward tag order: an equal-instant right is then caught by the
    # backward arm with gap 0, which always wins, so the forward arm
    # missing same-ts rows is immaterial.
    from pyspark.sql import types as _T
    r_side, l_side = ((1, 0) if direction == "forward" else (0, 1))
    # _R-prefixed ts field name: payload columns can't start with _R
    # (reserved-name guard above), so the field never shadows one
    ts_field = _R + "ts"
    pay = _R + "pay"
    pay_type = _T.StructType(
        [_T.StructField(ts_field, right.schema[rts].dataType)]
        + [_T.StructField(c, right.schema[c].dataType)
           for c in payload])
    lf = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_asof_t"),
        F.lit(l_side).alias("_asof_side"),
        F.lit(None).cast(pay_type).alias(pay))
    rf = right.select(
        *[(F.col(c) if c in keys
           else F.lit(None).cast(left.schema[c].dataType)).alias(c)
          for c in left.columns],
        F.col(rts).alias("_asof_t"),
        F.lit(r_side).alias("_asof_side"),
        F.struct(
            F.col(rts).alias(ts_field),
            *[F.col(c).alias(c) for c in payload]).alias(pay))
    u = lf.unionByName(rf)

    wb = (W.partitionBy(*keys).orderBy("_asof_t", "_asof_side")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    wf = (W.partitionBy(*keys).orderBy("_asof_t", "_asof_side")
          .rowsBetween(W.currentRow, W.unboundedFollowing))
    back = lambda c: F.last(c, ignorenulls=True).over(wb)  # noqa: E731
    fwd = lambda c: F.first(c, ignorenulls=True).over(wf)  # noqa: E731

    if direction == "backward":
        u = u.select(*u.columns, back(pay).alias(pay + "_c"))
    elif direction == "forward":
        u = u.select(*u.columns, fwd(pay).alias(pay + "_c"))
    else:
        # nearest: BOTH carries in the same window pass (two frames,
        # one partitioning — still a single Exchange), picked per row
        # by exact integer gap; ties prefer backward (pandas semantics)
        u = u.select(*u.columns,
                     back(pay).alias(pay + "_b"),
                     fwd(pay).alias(pay + "_f"))
        lt = F.unix_micros(F.col("_asof_t"))
        bts = F.col(pay + "_b")[ts_field]
        fts = F.col(pay + "_f")[ts_field]
        use_b = F.col(pay + "_b").isNotNull() & (
            F.col(pay + "_f").isNull()
            | ((lt - F.unix_micros(bts))
               <= (F.unix_micros(fts) - lt)))
        u = u.select(*u.columns,
                     F.when(use_b, F.col(pay + "_b"))
                     .otherwise(F.col(pay + "_f")).alias(pay + "_c"))
    u = u.filter(F.col("_asof_side") == l_side)

    carried = F.col(pay + "_c")
    matched = carried.isNotNull()
    if tolerance_s is not None:
        # exact integer microseconds — no float time arithmetic
        gap = (F.unix_micros(F.col("_asof_t"))
               - F.unix_micros(carried[ts_field]))
        if direction == "forward":
            gap = -gap
        elif direction == "nearest":
            gap = F.abs(gap)
        matched = matched & (gap <= int(tolerance_s * 1_000_000))

    def out_name(c: str) -> str:
        return c + suffix if (c in left.columns or c == rts) else c

    outs = [F.col(c) for c in left.columns]
    outs += [F.when(matched, carried[f])
             .alias(out_name(c))
             for c, f in [(rts, ts_field)] + [(c, c) for c in payload]]
    return u.select(*outs)


def _asof_join_sliced(left: DataFrame, right: DataFrame, keys: List[str],
                      left_ts: str, right_ts: Optional[str],
                      direction: str, tolerance_s: Optional[float],
                      suffix: str, slice_s: int) -> DataFrame:
    """asof_join's hot-key time-slicing arm: window per (key, chunk)
    with cross-chunk carry rows injected, results exactly equal to the
    single-window form (see asof_join docstring; equality
    property-tested in test_temporal.py).

    The carry computation runs on one row per (key, chunk) — the
    chunk-level LOCF is itself a tiny as-of pass over per-chunk
    aggregates, so the hot key's row-level history is only ever sorted
    in bounded per-chunk partitions."""
    if slice_s <= 0:
        raise ValueError(f"slice_s must be > 0, got {slice_s}")
    ck = "_asof_slice"
    reserved = {ck, "__st", "__sp", "__ct", "__cp", "__side"}
    for df_, name in ((left, "left"), (right, "right")):
        clash = reserved & set(df_.columns)
        if clash:
            raise ValueError(
                f"{name} input uses asof_join slicing's reserved "
                f"column(s) {sorted(clash)}; rename before joining")
    rts = right_ts or left_ts
    payload = [c for c in right.columns if c not in keys and c != rts]
    l2 = left.withColumn(ck, time_bucket(F.col(left_ts), slice_s))
    r2 = right.withColumn(ck, time_bucket(F.col(rts), slice_s))
    lc = l2.select(*keys, ck).distinct()
    ts_type = right.schema[rts].dataType

    def _chunk_carry(backward: bool) -> DataFrame:
        # one row per (key, chunk) on the right; unique (key, ts)
        # makes max_by/min_by deterministic
        aggs = [(F.max(rts) if backward else F.min(rts)).alias("__st")]
        if payload:
            pstruct = F.struct(*[F.col(c) for c in payload])
            aggs.append((F.max_by(pstruct, F.col(rts)) if backward
                         else F.min_by(pstruct, F.col(rts)))
                        .alias("__sp"))
        pc = r2.groupBy(*keys, ck).agg(*aggs)
        null_sp = ([F.lit(None).cast(
            pc.schema["__sp"].dataType).alias("__sp")]
            if payload else [])
        if backward:
            # right rows sort AFTER the marker within a chunk, so the
            # preceding-exclusive frame sees strictly earlier chunks
            m = pc.select(*keys, ck, F.lit(1).alias("__side"), "__st",
                          *(["__sp"] if payload else []))
            lm = lc.select(*keys, ck, F.lit(0).alias("__side"),
                           F.lit(None).cast(ts_type).alias("__st"),
                           *null_sp)
            w = (W.partitionBy(*keys).orderBy(ck, "__side")
                 .rowsBetween(W.unboundedPreceding, -1))
            pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
            marker = 0
        else:
            # right rows sort BEFORE the marker within a chunk, so the
            # following-exclusive frame sees strictly later chunks
            m = pc.select(*keys, ck, F.lit(0).alias("__side"), "__st",
                          *(["__sp"] if payload else []))
            lm = lc.select(*keys, ck, F.lit(1).alias("__side"),
                           F.lit(None).cast(ts_type).alias("__st"),
                           *null_sp)
            w = (W.partitionBy(*keys).orderBy(ck, "__side")
                 .rowsBetween(1, W.unboundedFollowing))
            pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
            marker = 1
        u = m.unionByName(lm)
        carried = (u.select(
            *keys, ck, "__side", pick("__st").alias("__ct"),
            *([pick("__sp").alias("__cp")] if payload else []))
            .filter((F.col("__side") == marker)
                    & F.col("__ct").isNotNull()))
        # reshape to r2's schema: carried ts/payload, TARGET chunk id
        return carried.select(
            *[F.col(c) for c in keys],
            F.col("__ct").alias(rts),
            *[F.col("__cp")[c].alias(c) for c in payload],
            F.col(ck)).select(*r2.columns)

    r3 = r2
    if direction in ("backward", "nearest"):
        r3 = r3.unionByName(_chunk_carry(backward=True))
    if direction in ("forward", "nearest"):
        r3 = r3.unionByName(_chunk_carry(backward=False))
    out = asof_join(l2, r3, keys + [ck], left_ts, right_ts, direction,
                    tolerance_s, suffix, slice_s=None)
    return out.drop(ck)


def time_bucket(ts: Column, width_s: int) -> Column:
    """Integer time bucket: floor(epoch_micros / width_micros). Exact
    integer arithmetic throughout: subtract pmod (making the dividend
    an exact multiple of the width), then divide in DECIMAL(38,0) —
    Spark's ``/`` on bigints is IEEE double division, exact only while
    |epoch_us| < 2^53 (~year 2255 / pre-1684), beyond which the bucket
    id could round off by one (ADVICE r5). Decimal division of an
    exact multiple is exact over the full bigint range."""
    width_us = F.lit(int(width_s) * 1_000_000)
    us = F.unix_micros(ts)
    exact = (us - F.pmod(us, width_us)).cast("decimal(38,0)")
    return (exact / width_us).cast("bigint")


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           on: Sequence[str], point_ts: str,
                           start_ts: str, end_ts: str,
                           bucket_width_s: int) -> DataFrame:
    """Inner join of point rows to every interval row (same ``on`` keys)
    whose ``[start_ts, end_ts]`` closed range contains ``point_ts``.

    Equi-join reformulation: grid time into ``bucket_width_s`` buckets;
    a point has one bucket, an interval covers ``ceil(len/width)+1``;
    join on (keys..., bucket) then apply the exact containment filter.
    Pick the width near the TYPICAL interval length: too small explodes
    the interval side, too large degrades to a per-key bucket join.
    Intervals with end < start are dropped (empty ranges), matching the
    SQL ``BETWEEN`` predicate which no row can satisfy.

    Column collisions between the two inputs are the caller's problem
    (rename first) — kept explicit because silent suffixing hides bugs
    in pipeline code.
    """
    keys = list(on)
    overlap = set(points.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"point/interval column collision {sorted(overlap)}; "
            "rename before joining")
    if "_pib_b" in points.columns or "_pib_b" in intervals.columns:
        raise ValueError("'_pib_b' is reserved by "
                         "point_in_interval_join; rename it")
    p = points.withColumn("_pib_b", time_bucket(F.col(point_ts),
                                                bucket_width_s))
    iv = (intervals
          .filter(F.col(end_ts) >= F.col(start_ts))
          .withColumn(
              "_pib_b",
              F.explode(F.sequence(
                  time_bucket(F.col(start_ts), bucket_width_s),
                  time_bucket(F.col(end_ts), bucket_width_s)))))
    j = p.join(iv, keys + ["_pib_b"], "inner")
    j = j.filter((F.col(point_ts) >= F.col(start_ts))
                 & (F.col(point_ts) <= F.col(end_ts)))
    return j.drop("_pib_b")


def time_bucket_gapfill(df: DataFrame, keys: Sequence[str],
                        bucket_col: str,
                        zero_cols: Sequence[str] = (),
                        locf_cols: Sequence[str] = ()) -> DataFrame:
    """Densify a bucketed aggregate: for every key, emit one row per
    integer bucket between that key's min and max observed bucket.
    ``zero_cols`` fill gaps with 0; ``locf_cols`` carry the last
    observed value forward (leading gaps before the first observation
    stay NULL). Remaining columns are NULL in gap rows.

    Two shuffles: the per-key range aggregate and the window sort; the
    range->sequence explode is driver-free and linear in the number of
    emitted rows. At 100 TB the emitted density is the cost knob —
    gapfill per (entity, hour) over years multiplies rows; bound the
    range upstream (WHERE on the bucket) before densifying.
    """
    keys = list(keys)
    rng = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("_gf_min"), F.max(bucket_col).alias("_gf_max"))
    full = rng.select(
        *keys,
        F.explode(F.sequence("_gf_min", "_gf_max")).alias(bucket_col))
    j = full.join(df, keys + [bucket_col], "left")
    out = []
    w = W.partitionBy(*keys).orderBy(bucket_col) \
         .rowsBetween(W.unboundedPreceding, W.currentRow)
    for c in j.columns:
        if c in zero_cols:
            out.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif c in locf_cols:
            out.append(F.last(c, ignorenulls=True).over(w).alias(c))
        else:
            out.append(F.col(c))
    return j.select(*out)


def interval_overlap_join(a: DataFrame, b: DataFrame, on: Sequence[str],
                          a_start: str, a_end: str,
                          b_start: str, b_end: str,
                          bucket_width_s: int) -> DataFrame:
    """Inner join of interval rows to interval rows (same ``on`` keys)
    where the closed ranges overlap: ``a_start <= b_end AND b_start <=
    a_end``. The segment-alignment primitive (audio/video span
    matching, session-vs-session comparison).

    Equi-join reformulation with an exact dedup: both sides explode to
    their covered buckets and meet on (keys..., bucket); a pair that
    shares M buckets would surface M times, so only the FIRST shared
    bucket keeps the pair — that bucket is ``bucket(max(a_start,
    b_start))``, the overlap's first instant, which both explosions
    necessarily cover. One predicate, no distinct, no shuffle beyond
    the join's own.

    Empty ranges (end < start) are dropped on both sides — nothing can
    overlap them under the closed-range predicate.
    """
    keys = list(on)
    overlap = set(a.columns) & set(b.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"interval column collision {sorted(overlap)}; "
            "rename before joining")
    if "_iv_b" in a.columns or "_iv_b" in b.columns:
        raise ValueError("'_iv_b' is reserved by "
                         "interval_overlap_join; rename it")

    def explode_side(df, s, e):
        return (df.filter(F.col(e) >= F.col(s))
                .withColumn("_iv_b", F.explode(F.sequence(
                    time_bucket(F.col(s), bucket_width_s),
                    time_bucket(F.col(e), bucket_width_s)))))

    ea = explode_side(a, a_start, a_end)
    eb = explode_side(b, b_start, b_end)
    j = ea.join(eb, keys + ["_iv_b"], "inner")
    j = j.filter(
        (F.col(a_start) <= F.col(b_end))
        & (F.col(b_start) <= F.col(a_end))
        & (F.col("_iv_b") == time_bucket(
            F.greatest(F.col(a_start), F.col(b_start)), bucket_width_s)))
    return j.drop("_iv_b")


def funnel_times(events: DataFrame, steps: Sequence[str],
                 user: str = "user_id", ts: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time chain
    t1 < t2 < ... < tk where ti is the first ``steps[i]`` event STRICTLY
    after t(i-1) — the product-analytics conversion primitive
    (view -> click -> purchase). Returns one row per user with columns
    ``t_<step>`` (NULL from the first uncompleted step onward: a NULL
    t(i-1) nulls every later bound by three-valued ``>``).

    ZERO joins: step i is a windowed conditional min over the user
    partition referencing step i-1's column, so k steps stack k Window
    operators over ONE hash exchange — at 100 TB the cost is a single
    shuffle on the user key, however long the funnel. (The textbook
    formulation joins each step's aggregate back: k shuffles and k
    join builds for the same answer.)

    Repeated step names are allowed (e.g. view -> view) and mean "a
    second, strictly later occurrence".
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = W.partitionBy(user)
    out = events.select(user, ts, type_col)
    prev = None
    names = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts) > F.col(prev))
        name = f"t_{i}_{s}"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts)))
                             .over(w))
        names.append(name)
        prev = name
    return (out.groupBy(user)
            .agg(*[F.max(n).alias(n) for n in names]))


def scd2_history(df: DataFrame, keys: Sequence[str], ts_col: str,
                 attr_cols: Sequence[str],
                 tiebreak: Optional[str] = None) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a mutation log:
    collapse each key's consecutive identical attribute states into one
    row and stamp it with a validity interval. Adds four columns to the
    surviving rows: ``valid_from`` (the change's timestamp),
    ``valid_to`` (the NEXT change's timestamp, NULL on the open
    current row), ``version`` (1-based change ordinal per key), and
    ``is_current``.

    This is the warehouse-side half of federated dimension sync: the
    reference ships remote dims verbatim (sqltable.rs scan); a lakehouse
    ingesting those snapshots/CDC feeds needs the type-2 compaction to
    answer "state as of t" joins (which then feed asof_join above).

    Semantics:

    - A row survives iff it is its key's first row or ANY attr column
      differs from the previous row's value, NULL-safely (NULL -> value
      and value -> NULL are both changes; NULL -> NULL is not).
    - Ordering within a key is ``ts_col`` then ``tiebreak`` (pass a
      unique id whenever timestamps can tie — without it, "the"
      previous row of tied timestamps is engine-arbitrary).
    - NULL timestamps are the caller's contract to exclude: Spark
      sorts NULLs FIRST ascending while most SQL engines (DuckDB,
      Postgres) default to NULLS LAST, so a NULL-timestamped mutation
      would take a different slot in a cross-engine oracle. Filter
      them (or repair upstream) before calling.

    100 TB: exactly ONE hash Exchange on ``keys``. The change filter
    and the interval stamping are two Window passes over the same
    (partitioning, ordering), so Catalyst plans the second without a
    new shuffle (the kept subset is re-sorted in place; EnsureRequirements
    sees the child's hash distribution already satisfied — pinned in
    test_temporal.py). A pathologically hot key serializes its sort;
    the time-slicing mitigation in the module docstring applies
    unchanged.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if not attr_cols:
        raise ValueError("attr_cols must be non-empty")
    clash = {"valid_from", "valid_to", "version", "is_current"} & \
        set(df.columns)
    if clash:
        raise ValueError(f"df already has SCD2 output columns: "
                         f"{sorted(clash)}")
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(*keys).orderBy(*order)
    # first row of the key: lag over a constant is NULL exactly there
    changed = F.lag(F.lit(1)).over(w).isNull()
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    kept = (df.withColumn("__scd2_keep", changed)
            .filter(F.col("__scd2_keep")).drop("__scd2_keep"))
    return (kept
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w))
            .withColumn("version",
                        F.row_number().over(w).cast("bigint"))
            .withColumn("is_current", F.lead(ts_col).over(w).isNull()))


def sessionize(df: DataFrame, keys: Sequence[str], ts_col: str,
               gap_seconds: float,
               tiebreak: Optional[str] = None,
               session_col: str = "session_seq") -> DataFrame:
    """Gap-based batch sessionization: number each key's events into
    sessions that break whenever the idle time between consecutive
    events exceeds ``gap_seconds`` (the batch twin of the streaming
    session windows in ``streaming/``; web analytics, training-log
    segmentation, funnel scoping all start here).

    Classic two-window formulation over ONE hash shuffle on ``keys``:
    a lag marks session starts (first event, or gap exceeded), a
    running sum of the markers is the 1-based per-key session sequence.
    Both windows share the partition AND sort keys, so Spark plans one
    Exchange + one Sort feeding both Window nodes (pinned in
    tests/test_temporal.py TestSessionize).

    Determinism: time math runs on ``unix_micros`` BIGINT (no float
    epoch), and ``tiebreak`` orders equal-timestamp events — pass a
    unique column (event id) whenever timestamps can collide, or
    session membership at exact boundaries is engine-arbitrary.
    NULL timestamps sort FIRST (Spark window default) and each becomes
    its own single-event session (its lag is always NULL); filter or
    impute them upstream if that's not wanted, and pin NULLS FIRST
    explicitly when replaying on engines that default to NULLS LAST
    in window order (DuckDB).

    100 TB: per-key partitions bound the sort; a pathologically hot key
    serializes its window like any keyed sort would — the as-of
    ``slice_s`` carry-row pattern above applies if one key ever
    dominates (sessions cannot span a slice boundary wider than the
    session gap, so slices need gap-sized overlap carries).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    if session_col in df.columns:
        raise ValueError(f"df already has a {session_col!r} column")
    gap_us = int(round(gap_seconds * 1_000_000))
    # materialize micros ONCE: ordering two windows by the raw
    # expression makes Spark extract it into two distinct projected
    # columns, and the second (identical) Sort survives planning —
    # a named column lets the sorts unify (plan pin: 1 Exchange, 1 Sort)
    mcol = f"__{session_col}_us"
    if mcol in df.columns:
        raise ValueError(f"df already has a {mcol!r} column")
    tagged = df.withColumn(mcol, F.unix_micros(F.col(ts_col)))
    us = F.col(mcol)
    order = [us] + ([F.col(tiebreak)] if tiebreak else [])
    w = W.partitionBy(*keys).orderBy(*order)
    prev = F.lag(us).over(w)
    new_session = (prev.isNull()
                   | ((us - prev) > F.lit(gap_us))).cast("int")
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    return tagged.withColumn(
        session_col, F.sum(new_session).over(wrun).cast("bigint")) \
        .drop(mcol)
