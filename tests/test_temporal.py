"""Temporal operators: as-of join, point-in-interval join, gapfill.

Strategy: every operator is checked against a brute-force formulation of
the same semantics on randomized (seeded) data — the slow shape is the
spec, the scalable shape is the implementation — plus plan pins for the
shapes that must survive 100 TB (no Join node in as-of; no
nested-loop in the interval join).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datafusion_federation_spark.operators.temporal import (
    asof_join, point_in_interval_join, time_bucket, time_bucket_gapfill)

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def _random_sides(spark, seed, n_left=120, n_right=80, n_keys=7):
    rng = random.Random(seed)
    left = [(rng.randrange(n_keys), _ts(rng.randrange(0, 5000)), i)
            for i in range(n_left)]
    # unique (key, ts) on the right: the as-of contract
    seen, right = set(), []
    for j in range(n_right):
        k, m = rng.randrange(n_keys), rng.randrange(0, 5000)
        if (k, m) in seen:
            continue
        seen.add((k, m))
        right.append((k, _ts(m), 1000 + j))
    l = spark.createDataFrame(left, "k int, t timestamp, lid int")
    r = spark.createDataFrame(right, "k int, t timestamp, rid int")
    return l, r, left, right


def _brute_asof(left, right, direction, tolerance_s=None):
    out = {}
    for k, lt, lid in left:
        cands = [(rt, rid) for rk, rt, rid in right if rk == k]
        if direction == "backward":
            cands = [c for c in cands if c[0] <= lt]
            pick = max(cands) if cands else None
        else:
            cands = [c for c in cands if c[0] >= lt]
            pick = min(cands) if cands else None
        if pick is not None and tolerance_s is not None:
            gap = abs((lt - pick[0]).total_seconds())
            if gap > tolerance_s:
                pick = None
        out[lid] = pick[1] if pick else None
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_brute_force(spark, direction):
    l, r, left, right = _random_sides(spark, seed=11)
    got = {row.lid: row.rid
           for row in asof_join(l, r, ["k"], "t",
                                direction=direction).collect()}
    assert got == _brute_asof(left, right, direction)


def test_asof_tolerance(spark):
    l, r, left, right = _random_sides(spark, seed=23)
    got = {row.lid: row.rid
           for row in asof_join(l, r, ["k"], "t",
                                tolerance_s=600).collect()}
    assert got == _brute_asof(left, right, "backward", tolerance_s=600)
    # tolerance must null EVERY right column of a too-old match, not
    # just the id (the struct-null contract)
    any_gap = asof_join(l, r, ["k"], "t", tolerance_s=0.001)
    for row in any_gap.collect():
        assert (row.rid is None) == (row.t_right is None)


def test_asof_equal_instant_is_inclusive(spark):
    l = spark.createDataFrame([(1, _ts(100), 5)],
                              "k int, t timestamp, lid int")
    r = spark.createDataFrame([(1, _ts(100), 77)],
                              "k int, t timestamp, rid int")
    assert asof_join(l, r, ["k"], "t").collect()[0].rid == 77
    assert asof_join(l, r, ["k"], "t",
                     direction="forward").collect()[0].rid == 77


def test_asof_suffixes_colliding_columns(spark):
    l = spark.createDataFrame([(1, _ts(10), "L")],
                              "k int, t timestamp, v string")
    r = spark.createDataFrame([(1, _ts(5), "R")],
                              "k int, t timestamp, v string")
    row = asof_join(l, r, ["k"], "t").collect()[0]
    assert row.v == "L" and row.v_right == "R"
    assert row.t_right == _ts(5)


def test_asof_plan_has_no_join(spark):
    l, r, *_ = _random_sides(spark, seed=3)
    plan = asof_join(l, r, ["k"], "t")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_asof_rejects_bad_direction(spark):
    l, r, *_ = _random_sides(spark, seed=3)
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, ["k"], "t", direction="sideways")


def _random_intervals(spark, seed, n_pts=150, n_iv=40, n_keys=5):
    rng = random.Random(seed)
    pts = [(rng.randrange(n_keys), _ts(rng.randrange(0, 3000)), i)
           for i in range(n_pts)]
    iv = []
    for j in range(n_iv):
        s = rng.randrange(0, 3000)
        iv.append((rng.randrange(n_keys), _ts(s),
                   _ts(s + rng.randrange(0, 240)), 1000 + j))
    p = spark.createDataFrame(pts, "k int, t timestamp, pid int")
    i = spark.createDataFrame(iv, "k int, s timestamp, e timestamp, ivid int")
    return p, i, pts, iv


@pytest.mark.parametrize("width_s", [60, 3600, 7200])
def test_point_in_interval_matches_brute(spark, width_s):
    p, i, pts, iv = _random_intervals(spark, seed=7)
    got = {(r.pid, r.ivid)
           for r in point_in_interval_join(
               p, i, ["k"], "t", "s", "e", width_s).collect()}
    want = {(pid, ivid)
            for k, t_, pid in pts
            for ik, s, e, ivid in iv
            if ik == k and s <= t_ <= e}
    assert got == want


def test_point_in_interval_drops_empty_ranges(spark):
    p = spark.createDataFrame([(1, _ts(10), 1)],
                              "k int, t timestamp, pid int")
    i = spark.createDataFrame([(1, _ts(20), _ts(5), 9)],
                              "k int, s timestamp, e timestamp, ivid int")
    assert point_in_interval_join(p, i, ["k"], "t", "s", "e",
                                  3600).count() == 0


def test_point_in_interval_rejects_collisions(spark):
    p = spark.createDataFrame([(1, _ts(10), 1)],
                              "k int, t timestamp, x int")
    i = spark.createDataFrame([(1, _ts(0), _ts(20), 2)],
                              "k int, s timestamp, e timestamp, x int")
    with pytest.raises(ValueError, match="collision"):
        point_in_interval_join(p, i, ["k"], "t", "s", "e", 3600)


def test_point_in_interval_no_nested_loop(spark):
    p, i, *_ = _random_intervals(spark, seed=9)
    plan = point_in_interval_join(p, i, ["k"], "t", "s", "e", 3600) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_time_bucket_exact_boundaries(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 0),),
         (dt.datetime(2024, 1, 1, 0, 59, 59, 999999),),
         (dt.datetime(2024, 1, 1, 1, 0, 0),),
         (dt.datetime(1969, 12, 31, 23, 30, 0),)], "t timestamp")
    got = [r.b for r in
           df.select(time_bucket(F.col("t"), 3600).alias("b")).collect()]
    epoch_h = 473352  # hours from epoch to 2024-01-01 00:00 UTC
    assert got == [epoch_h, epoch_h, epoch_h + 1, -1]


def test_time_bucket_exact_beyond_double_mantissa(spark):
    """ADVICE r5: bigint '/' is IEEE double division, exact only below
    2^53 epoch-us (~year 2255 / pre-1684). The decimal-division form
    must floor exactly over the whole timestamp range."""
    us_vals = [-9214560000000000, -1, 0, 1,
               9214560000000123,      # > 2^53, year ~2262
               -9123456789012345]     # < -2^53, pre-1684
    df = spark.createDataFrame([(v,) for v in us_vals], "us long") \
        .select("us", F.timestamp_micros(F.col("us")).alias("t"))
    got = {r.us: r.b for r in
           df.select("us", time_bucket(F.col("t"), 3600).alias("b"))
           .collect()}
    for v in us_vals:
        assert got[v] == v // (3600 * 1_000_000), (v, got[v])


def test_gapfill_zero_and_locf(spark):
    df = spark.createDataFrame(
        [("a", 10, 1, 5.0), ("a", 13, 2, 7.0), ("b", 3, 4, 1.5)],
        "g string, b bigint, n bigint, v double")
    got = {(r.g, r.b): (r.n, r.v)
           for r in time_bucket_gapfill(
               df, ["g"], "b", zero_cols=["n"],
               locf_cols=["v"]).collect()}
    assert got == {("a", 10): (1, 5.0), ("a", 11): (0, 5.0),
                   ("a", 12): (0, 5.0), ("a", 13): (2, 7.0),
                   ("b", 3): (4, 1.5)}


def test_gapfill_leading_gap_stays_null(spark):
    # a key whose FIRST bucket row has NULL v: locf has nothing to
    # carry, so the leading rows stay NULL (no invented values)
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 3, 9.0)], "g string, b bigint, v double")
    got = {r.b: r.v for r in time_bucket_gapfill(
        df, ["g"], "b", locf_cols=["v"]).collect()}
    assert got == {1: None, 2: None, 3: 9.0}


def _random_two_interval_sets(spark, seed, n_a=40, n_b=40, n_keys=4):
    rng = random.Random(seed)

    def mk(n, base_id):
        out = []
        for j in range(n):
            s = rng.randrange(0, 2000)
            out.append((rng.randrange(n_keys), _ts(s),
                        _ts(s + rng.randrange(0, 300)), base_id + j))
        return out

    av, bv = mk(n_a, 100), mk(n_b, 500)
    a = spark.createDataFrame(
        av, "k int, a_s timestamp, a_e timestamp, aid int")
    b = spark.createDataFrame(
        bv, "k int, b_s timestamp, b_e timestamp, bid int")
    return a, b, av, bv


@pytest.mark.parametrize("width_s", [60, 1800, 7200])
def test_interval_overlap_matches_brute(spark, width_s):
    from datafusion_federation_spark.operators.temporal import (
        interval_overlap_join)
    a, b, av, bv = _random_two_interval_sets(spark, seed=17)
    rows = interval_overlap_join(a, b, ["k"], "a_s", "a_e",
                                 "b_s", "b_e", width_s).collect()
    got = [(r.aid, r.bid) for r in rows]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    want = {(aid, bid)
            for k, s1, e1, aid in av
            for k2, s2, e2, bid in bv
            if k == k2 and s1 <= e2 and s2 <= e1}
    assert set(got) == want


def test_interval_overlap_rejects_collisions(spark):
    from datafusion_federation_spark.operators.temporal import (
        interval_overlap_join)
    a = spark.createDataFrame([(1, _ts(0), _ts(10), 1)],
                              "k int, s timestamp, e timestamp, x int")
    b = spark.createDataFrame([(1, _ts(5), _ts(15), 2)],
                              "k int, s2 timestamp, e2 timestamp, x int")
    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(a, b, ["k"], "s", "e", "s2", "e2", 60)


def test_asof_rejects_reserved_columns(spark):
    l = spark.createDataFrame([(1, _ts(0), 1)],
                              "k int, t timestamp, _asof_t int")
    r = spark.createDataFrame([(1, _ts(0), 2)],
                              "k int, t timestamp, rid int")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(l, r, ["k"], "t")


def test_asof_rejects_output_name_clash(spark):
    # a left column literally named 'ts_right' would collide with the
    # suffixed right-timestamp output
    l = spark.createDataFrame([(1, _ts(0), 5)],
                              "k int, ts timestamp, ts_right int")
    r = spark.createDataFrame([(1, _ts(0), 2)],
                              "k int, ts timestamp, rid int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, ["k"], "ts")


def test_bucket_joins_reject_reserved_bucket_column(spark):
    from datafusion_federation_spark.operators.temporal import (
        interval_overlap_join)
    p = spark.createDataFrame([(1, _ts(10), 1)],
                              "k int, t timestamp, _pib_b int")
    i = spark.createDataFrame([(1, _ts(0), _ts(20), 2)],
                              "k int, s timestamp, e timestamp, iv int")
    with pytest.raises(ValueError, match="_pib_b"):
        point_in_interval_join(p, i, ["k"], "t", "s", "e", 3600)
    a = spark.createDataFrame([(1, _ts(0), _ts(10), 1)],
                              "k int, s timestamp, e timestamp, _iv_b int")
    b = spark.createDataFrame([(1, _ts(5), _ts(15), 2)],
                              "k int, s2 timestamp, e2 timestamp, bid int")
    with pytest.raises(ValueError, match="_iv_b"):
        interval_overlap_join(a, b, ["k"], "s", "e", "s2", "e2", 60)


class TestFunnel:
    def _events(self, spark):
        rows = [
            # user 1 completes a->b->c in order
            (1, _ts(0), "a"), (1, _ts(10), "b"), (1, _ts(20), "c"),
            # user 2: c BEFORE b -> only depth 2 (a then b)
            (2, _ts(0), "a"), (2, _ts(5), "c"), (2, _ts(9), "b"),
            # user 3: never starts (b/c only)
            (3, _ts(1), "b"), (3, _ts(2), "c"),
            # user 4: a twice then b; first a counts
            (4, _ts(3), "a"), (4, _ts(4), "a"), (4, _ts(6), "b"),
            # user 5: b at the SAME instant as a -> strict > excludes
            (5, _ts(7), "a"), (5, _ts(7), "b"),
        ]
        return spark.createDataFrame(
            rows, "user_id int, ts timestamp, event_type string")

    def test_depths_and_times(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            funnel_times)
        out = {r.user_id: (r["t_0_a"], r["t_1_b"], r["t_2_c"])
               for r in funnel_times(self._events(spark),
                                     ["a", "b", "c"]).collect()}
        assert out[1] == (_ts(0), _ts(10), _ts(20))
        assert out[2] == (_ts(0), _ts(9), None)
        assert out[3] == (None, None, None)
        assert out[4] == (_ts(3), _ts(6), None)
        assert out[5] == (_ts(7), None, None)

    def test_single_exchange(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            funnel_times)
        plan = funnel_times(self._events(spark), ["a", "b", "c"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        # one shuffle for the windows; the final per-user aggregate
        # reuses the partitioning (no second exchange for groupBy)
        assert plan.count("Exchange") <= 2

    def test_repeated_step_means_later_occurrence(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            funnel_times)
        out = {r.user_id: (r["t_0_a"], r["t_1_a"])
               for r in funnel_times(self._events(spark),
                                     ["a", "a"]).collect()}
        assert out[4] == (_ts(3), _ts(4))
        assert out[1] == (_ts(0), None)

    def test_empty_steps_rejected(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            funnel_times)
        with pytest.raises(ValueError, match="non-empty"):
            funnel_times(self._events(spark), [])


def test_funnel_matches_brute_force_random(spark):
    from datafusion_federation_spark.operators.temporal import (
        funnel_times)
    rng = random.Random(41)
    types = ["a", "b", "c", "x"]
    rows = [(rng.randrange(12), _ts(rng.randrange(0, 500)),
             rng.choice(types)) for _ in range(400)]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string")
    got = {r.user_id: (r["t_0_a"], r["t_1_b"], r["t_2_c"])
           for r in funnel_times(df, ["a", "b", "c"]).collect()}

    def brute(u):
        evs = [(t_, ty) for uu, t_, ty in rows if uu == u]
        chain, bound = [], None
        for step in ["a", "b", "c"]:
            cand = [t_ for t_, ty in evs
                    if ty == step and (bound is None or t_ > bound)]
            if not cand:
                break
            bound = min(cand)
            chain.append(bound)
        return tuple(chain + [None] * (3 - len(chain)))

    for u in {uu for uu, _, _ in rows}:
        assert got[u] == brute(u), f"user {u}"


def test_asof_multi_key(spark):
    # composite join keys: the match must respect BOTH key columns
    l = spark.createDataFrame(
        [(1, "x", _ts(10), 1), (1, "y", _ts(10), 2)],
        "k int, g string, t timestamp, lid int")
    r = spark.createDataFrame(
        [(1, "x", _ts(5), 100), (1, "y", _ts(8), 200),
         (2, "x", _ts(1), 300)],
        "k int, g string, t timestamp, rid int")
    got = {row.lid: row.rid
           for row in asof_join(l, r, ["k", "g"], "t").collect()}
    assert got == {1: 100, 2: 200}


def test_asof_nearest_matches_brute(spark):
    l, r, left, right = _random_sides(spark, seed=29)
    got = {row.lid: row.rid
           for row in asof_join(l, r, ["k"], "t",
                                direction="nearest").collect()}

    def brute_nearest(u_left, u_right, tol=None):
        out = {}
        for k, lt, lid in u_left:
            cands = [(abs((lt - rt).total_seconds()),
                      0 if rt <= lt else 1, rt, rid)
                     for rk, rt, rid in u_right if rk == k]
            cands.sort()
            pick = cands[0] if cands else None
            if pick and tol is not None and pick[0] > tol:
                pick = None
            out[lid] = pick[3] if pick else None
        return out

    assert got == brute_nearest(left, right)
    tol = {row.lid: row.rid
           for row in asof_join(l, r, ["k"], "t", direction="nearest",
                                tolerance_s=300).collect()}
    assert tol == brute_nearest(left, right, tol=300)


def test_asof_nearest_tolerance_matches_pandas_merge_asof(spark):
    """ADVICE r5 suspected pick-then-null diverges from pandas'
    filter-then-pick in a corner (in-tolerance forward discarded for a
    nearer out-of-tolerance backward). That corner is unreachable:
    both gaps are nonnegative, so nearer-out-of-tolerance implies the
    farther side is out too. This pins the equivalence against REAL
    pandas merge_asof across randomized shapes and tolerances."""
    import pandas as pd
    import random
    rng = random.Random(1301)
    for _ in range(12):
        n_l, n_r = rng.randint(1, 12), rng.randint(1, 12)
        lts = sorted(rng.randint(0, 50) for _ in range(n_l))
        rts = sorted(rng.randint(0, 50) for _ in range(n_r))
        tol = rng.choice([None, 1, 3, 7])
        lpdf = pd.DataFrame({"k": 1, "t": pd.to_datetime(lts, unit="s"),
                             "lid": range(n_l)})
        rpdf = pd.DataFrame({"k": 1, "t": pd.to_datetime(rts, unit="s"),
                             "rid": range(n_r)}) \
            .drop_duplicates(subset=["k", "t"], keep="last")
        want = pd.merge_asof(
            lpdf, rpdf, on="t", by="k", direction="nearest",
            tolerance=None if tol is None else pd.Timedelta(seconds=tol))
        got = {row.lid: row.rid for row in asof_join(
            spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
            ["k"], "t", direction="nearest",
            tolerance_s=tol).collect()}
        wp = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
              for r in want.itertuples()}
        assert got == wp, (lts, rts, tol)


def test_asof_sliced_equals_single_window(spark):
    """slice_s (hot-key time slicing) must return EXACTLY the
    single-window form's rows for every direction and tolerance,
    including empty chunks (sparse right side) and cross-chunk
    carries. Randomized over clustered timestamps so chunks are both
    dense and empty."""
    import random
    rng = random.Random(4177)
    for trial in range(6):
        nl, nr = rng.randint(5, 40), rng.randint(0, 30)
        # cluster times so some 100s-wide chunks are empty
        def draw(n):
            return [rng.choice([rng.randint(0, 80),
                                rng.randint(400, 480),
                                rng.randint(900, 999)])
                    for _ in range(n)]
        l = spark.createDataFrame(
            [(rng.randint(1, 3), _ts(t), i)
             for i, t in enumerate(draw(nl))],
            "k int, t timestamp, lid int")
        seen = set()
        rrows = []
        for i, t in enumerate(draw(nr)):
            k = rng.randint(1, 3)
            if (k, t) in seen:
                continue
            seen.add((k, t))
            rrows.append((k, _ts(t), i))
        r = spark.createDataFrame(rrows or [(99, _ts(0), 0)],
                                  "k int, t timestamp, rid int")
        for direction in ("backward", "forward", "nearest"):
            tol = rng.choice([None, 50, 500])
            base = sorted((row.lid, row.rid) for row in asof_join(
                l, r, ["k"], "t", direction=direction,
                tolerance_s=tol).collect())
            sliced = sorted((row.lid, row.rid) for row in asof_join(
                l, r, ["k"], "t", direction=direction,
                tolerance_s=tol, slice_s=100).collect())
            assert base == sliced, (trial, direction, tol)


def test_asof_sliced_plan_partitions_by_chunk(spark):
    """The window partition spec must include the slice chunk — that IS
    the bounded-partition guarantee for a hot key."""
    l = spark.createDataFrame([(1, _ts(10), 5)],
                              "k int, t timestamp, lid int")
    r = spark.createDataFrame([(1, _ts(5), 1)],
                              "k int, t timestamp, rid int")
    out = asof_join(l, r, ["k"], "t", slice_s=60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_asof_slice" in plan
    # and the sliced output schema matches the unsliced one
    assert out.columns == asof_join(l, r, ["k"], "t").columns


def test_asof_sliced_rejects_reserved_and_bad_width(spark):
    l = spark.createDataFrame([(1, _ts(10), 5)],
                              "k int, t timestamp, lid int")
    r = spark.createDataFrame([(1, _ts(5), 1)],
                              "k int, t timestamp, rid int")
    with pytest.raises(ValueError, match="slice_s"):
        asof_join(l, r, ["k"], "t", slice_s=0)
    bad = l.withColumnRenamed("lid", "_asof_slice")
    with pytest.raises(ValueError, match="_asof_slice"):
        asof_join(bad, r, ["k"], "t", slice_s=60)


def test_asof_nearest_tie_prefers_backward(spark):
    l = spark.createDataFrame([(1, _ts(10), 5)],
                              "k int, t timestamp, lid int")
    r = spark.createDataFrame([(1, _ts(5), 1), (1, _ts(15), 2)],
                              "k int, t timestamp, rid int")
    assert asof_join(l, r, ["k"], "t",
                     direction="nearest").collect()[0].rid == 1


class TestScd2History:
    def _log(self, spark):
        # user 1: a->a->b->b->a ; user 2: x(NULL)->NULL->NULL->y
        rows = [
            (1, _ts(0), "a", 10), (1, _ts(1), "a", 11),
            (1, _ts(2), "b", 12), (1, _ts(3), "b", 13),
            (1, _ts(4), "a", 14),
            (2, _ts(0), "x", 20), (2, _ts(1), None, 21),
            (2, _ts(2), None, 22), (2, _ts(3), "y", 23),
        ]
        return spark.createDataFrame(
            rows, "k int, t timestamp, state string, id int")

    def test_change_points_and_intervals(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            scd2_history)
        h = scd2_history(self._log(spark), ["k"], "t", ["state"],
                         tiebreak="id")
        got = [(r.k, r.state, r.valid_from, r.valid_to, r.version,
                r.is_current)
               for r in h.orderBy("k", "version").collect()]
        assert got == [
            (1, "a", _ts(0), _ts(2), 1, False),
            (1, "b", _ts(2), _ts(4), 2, False),
            (1, "a", _ts(4), None, 3, True),
            # NULL->NULL is NOT a change; x->NULL and NULL->y are
            (2, "x", _ts(0), _ts(1), 1, False),
            (2, None, _ts(1), _ts(3), 2, False),
            (2, "y", _ts(3), None, 3, True),
        ]

    def test_multi_attr_any_change_survives(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            scd2_history)
        df = spark.createDataFrame(
            [(1, _ts(0), "a", 1, 100), (1, _ts(1), "a", 2, 101),
             (1, _ts(2), "a", 2, 102), (1, _ts(3), "b", 2, 103)],
            "k int, t timestamp, s string, v int, id int")
        h = scd2_history(df, ["k"], "t", ["s", "v"], tiebreak="id")
        assert [(r.s, r.v, r.version) for r in
                h.orderBy("version").collect()] == [
            ("a", 1, 1), ("a", 2, 2), ("b", 2, 3)]

    def test_tiebreak_orders_equal_timestamps(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            scd2_history)
        df = spark.createDataFrame(
            [(1, _ts(0), "b", 2), (1, _ts(0), "a", 1)],
            "k int, t timestamp, s string, id int")
        h = scd2_history(df, ["k"], "t", ["s"], tiebreak="id")
        assert [(r.s, r.version, r.is_current) for r in
                h.orderBy("version").collect()] == [
            ("a", 1, False), ("b", 2, True)]

    def test_single_exchange(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            scd2_history)
        h = scd2_history(self._log(spark), ["k"], "t", ["state"],
                         tiebreak="id")
        plan = h._jdf.queryExecution().executedPlan().toString()
        # the change filter and the stamping windows share the hash
        # distribution: one Exchange, never two
        assert plan.count("Exchange") == 1, plan

    def test_contract_errors(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            scd2_history)
        df = self._log(spark)
        with pytest.raises(ValueError, match="keys"):
            scd2_history(df, [], "t", ["state"])
        with pytest.raises(ValueError, match="attr_cols"):
            scd2_history(df, ["k"], "t", [])
        clash = df.withColumn("version", F.lit(1))
        with pytest.raises(ValueError, match="output columns"):
            scd2_history(clash, ["k"], "t", ["state"])

    def test_scd2_feeds_asof_point_in_time(self, spark):
        """The composition the docstring promises: 'state as of t' =
        scd2_history (change points) -> asof_join on valid_from. Must
        equal the brute-force 'latest event at-or-before t' on the RAW
        log, because the history keeps exactly the first row of every
        run of equal states."""
        from datafusion_federation_spark.operators.temporal import (
            asof_join, scd2_history)
        rng = random.Random(99)
        states = ["a", "b", "c", None]
        log = [(rng.randrange(5), _ts(rng.randrange(0, 3000)),
                rng.choice(states), i) for i in range(300)]
        # unique (k, t): the change-point contract needs a total order
        seen = set()
        log = [r for r in log
               if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
        queries = [(rng.randrange(5), _ts(rng.randrange(0, 3000)), qid)
                   for qid in range(80)]
        ldf = spark.createDataFrame(
            log, "k int, t timestamp, state string, id int")
        qdf = spark.createDataFrame(
            queries, "k int, qt timestamp, qid int")
        hist = scd2_history(ldf, ["k"], "t", ["state"], tiebreak="id") \
            .select("k", F.col("valid_from").alias("t"), "state")
        got = {r.qid: r.state for r in asof_join(
            qdf, hist, on=["k"], left_ts="qt", right_ts="t").collect()}
        want = {}
        for k, qt, qid in queries:
            cands = [(t, s) for kk, t, s, _ in log if kk == k and t <= qt]
            want[qid] = max(cands)[1] if cands else None
        assert got == want
        # same composition through the hot-key sliced arm (r6): slicing
        # must be invisible to downstream consumers of the composition
        got_sliced = {r.qid: r.state for r in asof_join(
            qdf, hist, on=["k"], left_ts="qt", right_ts="t",
            slice_s=500).collect()}
        assert got_sliced == want


def test_asof_null_payload_is_rowlevel(spark):
    """A matched right row with NULL payload fields must surface those
    NULLs — not resurrect an older right row's values — and two payload
    columns must come from the SAME right row (the per-column
    last(ignorenulls) carry did neither; seventh review, r5)."""
    r = spark.createDataFrame(
        [(1, _ts(0), "old", 10), (1, _ts(10), None, 20),
         (1, _ts(20), "new", None)],
        "k int, t timestamp, a string, b int")
    l = spark.createDataFrame(
        [(1, _ts(5), 0), (1, _ts(15), 1), (1, _ts(25), 2)],
        "k int, qt timestamp, lid int")
    got = {x.lid: (x.a, x.b) for x in
           asof_join(l, r, on=["k"], left_ts="qt", right_ts="t")
           .collect()}
    assert got == {0: ("old", 10),
                   # matched row (ts 10) has a NULL, b=20 — 'old'/10
                   # must NOT bleed through
                   1: (None, 20),
                   # matched row (ts 20) has a='new', b NULL — no mix
                   2: ("new", None)}
    # forward and nearest carry the same struct — spot-check forward
    fwd = {x.lid: (x.a, x.b) for x in
           asof_join(l, r, on=["k"], left_ts="qt", right_ts="t",
                     direction="forward").collect()}
    assert fwd == {0: (None, 20), 1: ("new", None), 2: (None, None)}


def test_scd2_partition_layout_invariant(spark):
    from datafusion_federation_spark.operators.temporal import (
        scd2_history)
    df = TestScd2History()._log(spark)

    def run(frame):
        return sorted(
            (r.k, r.version, r.state, r.valid_from, r.valid_to,
             r.is_current)
            for r in scd2_history(frame, ["k"], "t", ["state"],
                                  tiebreak="id").collect())

    assert run(df.coalesce(1)) == run(df.repartition(5, "id"))


# ---------------------------------------------------------------------------
# Batch sessionization (r7)
# ---------------------------------------------------------------------------

class TestSessionize:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            [(u, f"2024-01-01 00:{m:02d}:{s:02d}", i)
             for i, (u, m, s) in enumerate(rows)],
            "u string, ts_s string, eid int") \
            .selectExpr("u", "CAST(ts_s AS TIMESTAMP) ts", "eid")

    def test_gap_breaks_sessions(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            sessionize)
        # u=a: events at 0:00, 0:01, 0:05, 0:06 with 120s gap ->
        # sessions {0:00,0:01}, {0:05,0:06}; u=b: one event
        rows = [("a", 0, 0), ("a", 1, 0), ("a", 5, 0), ("a", 6, 0),
                ("b", 3, 0)]
        out = sessionize(self._df(spark, rows), ["u"], "ts", 120,
                         tiebreak="eid")
        got = {(r.u, r.eid): r.session_seq for r in out.collect()}
        assert got == {("a", 0): 1, ("a", 1): 1, ("a", 2): 2,
                       ("a", 3): 2, ("b", 4): 1}

    def test_boundary_gap_exactly_equal_stays_in_session(self, spark):
        """gap strictly-greater breaks: an idle time of EXACTLY
        gap_seconds continues the session (matches the streaming
        session-window close-on-exceed semantics)."""
        from datafusion_federation_spark.operators.temporal import (
            sessionize)
        rows = [("a", 0, 0), ("a", 2, 0), ("a", 4, 1)]  # 120s, 121s
        out = sessionize(self._df(spark, rows), ["u"], "ts", 120,
                         tiebreak="eid")
        got = [r.session_seq for r in out.orderBy("eid").collect()]
        assert got == [1, 1, 2]

    def test_tiebreak_determinism_and_layout_invariance(self, spark):
        from datafusion_federation_spark.operators.temporal import (
            sessionize)
        rows = [("a", 0, 0), ("a", 0, 0), ("a", 3, 0), ("a", 3, 0)]
        df = self._df(spark, rows)
        a = sorted(map(tuple, sessionize(df, ["u"], "ts", 120,
                                         tiebreak="eid").collect()))
        b = sorted(map(tuple,
                       sessionize(df.repartition(7), ["u"], "ts", 120,
                                  tiebreak="eid").collect()))
        assert a == b

    def test_single_exchange_two_shared_windows(self, spark):
        """Both windows ride ONE hash exchange + ONE sort on the key:
        the lag and the running sum share partition and order keys."""
        from datafusion_federation_spark.operators.temporal import (
            sessionize)
        df = spark.range(100).selectExpr(
            "CAST(id % 7 AS STRING) u",
            "timestamp_seconds(1700000000 + id * 40) ts", "id AS eid")
        plan = sessionize(df, ["u"], "ts", 60, tiebreak="eid") \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1
        assert plan.count("Sort") == 1

    def test_contract_errors(self, spark):
        import pytest
        from datafusion_federation_spark.operators.temporal import (
            sessionize)
        df = spark.range(3).selectExpr(
            "'a' u", "timestamp_seconds(id) ts", "id eid",
            "id AS session_seq")
        with pytest.raises(ValueError, match="keys"):
            sessionize(df, [], "ts", 60)
        with pytest.raises(ValueError, match="gap_seconds"):
            sessionize(df, ["u"], "ts", 0)
        with pytest.raises(ValueError, match="session_seq"):
            sessionize(df, ["u"], "ts", 60)
