"""Incremental-pipeline operators: snapshot_diff status semantics
(null-safe compare, presence vs NULL-key fields) and cdc_apply
latest-wins merge (delete/upsert/insert, tie determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_federation_spark.operators.incremental import (
    cdc_apply, snapshot_diff)


class TestSnapshotDiff:
    def test_all_four_statuses(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "k int, s string, v int")
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 99), (4, "d", 40)],
            "k int, s string, v int")
        got = {r.k: r.status
               for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {1: "unchanged", 2: "changed", 3: "removed",
                       4: "added"}

    def test_null_transitions_are_changed_null_null_is_not(self, spark):
        """NULL->value and value->NULL are CHANGED; NULL==NULL is
        UNCHANGED — the verdict is total (null-safe struct compare),
        never UNKNOWN."""
        old = spark.createDataFrame(
            [(1, None), (2, 5), (3, None)], "k int, v int")
        new = spark.createDataFrame(
            [(1, 7), (2, None), (3, None)], "k int, v int")
        got = {r.k: r.status
               for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {1: "changed", 2: "changed", 3: "unchanged"}

    def test_compare_cols_subset(self, spark):
        """Columns outside compare_cols do not affect the verdict."""
        old = spark.createDataFrame([(1, 10, "x")],
                                    "k int, v int, noise string")
        new = spark.createDataFrame([(1, 10, "y")],
                                    "k int, v int, noise string")
        assert snapshot_diff(old, new, ["k"],
                             compare_cols=["v"]).collect()[0] \
            .status == "unchanged"
        assert snapshot_diff(old, new, ["k"]).collect()[0] \
            .status == "changed"

    def test_no_shared_value_columns_means_presence_only(self, spark):
        old = spark.createDataFrame([(1,), (2,)], "k int")
        new = spark.createDataFrame([(2,), (3,)], "k int")
        got = {r.k: r.status
               for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {1: "removed", 2: "unchanged", 3: "added"}

    def test_single_join_plan(self, spark):
        """One outer join, no extra shuffles beyond the two sides."""
        old = spark.range(100).selectExpr("id k", "id % 7 v")
        new = spark.range(50, 150).selectExpr("id k", "id % 5 v")
        plan = snapshot_diff(old, new, ["k"]) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Join") == 1
        assert "FullOuter" in plan

    def test_validation(self, spark):
        df = spark.range(3).selectExpr("id k", "id v")
        with pytest.raises(ValueError, match="keys"):
            snapshot_diff(df, df, [])
        with pytest.raises(ValueError, match="missing key"):
            snapshot_diff(df, df.withColumnRenamed("k", "kk"), ["k"])


class TestCdcApply:
    BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]

    def _base(self, spark):
        return spark.createDataFrame(self.BASE, "k int, s string, v int")

    def test_upsert_delete_insert(self, spark):
        ch = spark.createDataFrame(
            [(2, "b", 99, "U", 1),    # update
             (3, "c", 30, "D", 1),    # delete
             (9, "z", 1, "I", 1)],    # insert
            "k int, s string, v int, op string, gen int")
        got = sorted(map(tuple, cdc_apply(
            self._base(spark), ch, ["k"], "gen").collect()))
        assert got == [(1, "a", 10), (2, "b", 99), (9, "z", 1)]

    def test_latest_wins_across_generations(self, spark):
        """A later delete beats an earlier update and vice versa."""
        ch = spark.createDataFrame(
            [(2, "b", 99, "U", 1), (2, "b", 20, "D", 2),
             (3, "c", 30, "D", 1), (3, "c", 77, "U", 2)],
            "k int, s string, v int, op string, gen int")
        got = sorted(map(tuple, cdc_apply(
            self._base(spark), ch, ["k"], "gen").collect()))
        assert got == [(1, "a", 10), (3, "c", 77)]

    def test_tiebreak_required_for_determinism(self, spark):
        """Equal order values: the tiebreak column decides, and the
        result is layout-invariant."""
        ch = spark.createDataFrame(
            [(2, "b", 1, "U", 1), (2, "b", 2, "Z", 1)],
            "k int, s string, v int, op string, gen int")
        base = self._base(spark)
        a = sorted(map(tuple, cdc_apply(base, ch, ["k"], "gen",
                                        tiebreak="op").collect()))
        b = sorted(map(tuple, cdc_apply(base.repartition(7),
                                        ch.repartition(5), ["k"],
                                        "gen", tiebreak="op").collect()))
        assert a == b
        assert (2, "b", 2) in a      # 'Z' > 'U' wins the tie

    def test_result_schema_is_base_schema(self, spark):
        ch = spark.createDataFrame(
            [(9, "z", 1, "I", 1)],
            "k int, s string, v int, op string, gen int")
        out = cdc_apply(self._base(spark), ch, ["k"], "gen")
        assert out.columns == ["k", "s", "v"]

    def test_validation(self, spark):
        base = self._base(spark)
        ch = spark.createDataFrame(
            [(1, "a", 1, "U", 1)],
            "k int, s string, v int, op string, gen int")
        with pytest.raises(ValueError, match="keys"):
            cdc_apply(base, ch, [], "gen")
        with pytest.raises(ValueError, match="missing column"):
            cdc_apply(base, ch.drop("op"), ["k"], "gen")
        with pytest.raises(ValueError, match="missing base columns"):
            cdc_apply(base, ch.drop("v"), ["k"], "gen")


def test_snapshot_diff_null_key_fields_pair(spark):
    """A NULL field inside the key must still pair the rows (null-safe
    join keys) — a plain equi-join reports the identical row as
    added+removed on every refresh (review r7)."""
    old = spark.createDataFrame(
        [(1, None, 10), (2, "x", 20)], "k1 int, k2 string, v int")
    new = spark.createDataFrame(
        [(1, None, 10), (2, "x", 25)], "k1 int, k2 string, v int")
    got = {(r.k1, r.k2): r.status for r in
           snapshot_diff(old, new, ["k1", "k2"]).collect()}
    assert got == {(1, None): "unchanged", (2, "x"): "changed"}


def test_cdc_apply_null_op_is_upsert(spark):
    """NULL op is not the delete op: the row upserts instead of
    silently vanishing (the null-rejecting != would drop it from
    upserts after its key was anti-joined out; review r7)."""
    base = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    ch = spark.createDataFrame([(2, 99, None, 1)],
                               "k int, v int, op string, gen int")
    got = sorted(map(tuple,
                     cdc_apply(base, ch, ["k"], "gen").collect()))
    assert got == [(1, 10), (2, 99)]
