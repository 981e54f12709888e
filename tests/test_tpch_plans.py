"""100 TB plan-shape assertions for the TPC-H h-suite.

The h-queries' correctness is oracle-checked (tools/check_correctness);
these tests pin the PHYSICAL shapes that keep them viable at scale:
no cartesian product anywhere, broadcast-nested-loop only for 1-row
scalar-subquery attachment, semi/anti joins for the quantified shapes,
and filters pushed into the parquet scans.
"""

from __future__ import annotations

import pytest

from tests.conftest import TESTDATA


def _plan(spark, name):
    import __spark_entry__ as entry
    df = entry.queries()[name](spark, TESTDATA)
    return df._jdf.queryExecution().executedPlan().toString()


#: queries whose ONLY nested-loop join is the broadcast of a 1-row
#: uncorrelated scalar-subquery result (ON TRUE) — a constant-size
#: build side — or, for h16, the null-aware NOT IN anti join (the
#: disjunctive null-check condition cannot be an equi-join; Spark SQL's
#: own NOT IN lowers to the same broadcast nested-loop shape, and the
#: build side is the small subquery result)
_SCALAR_BNL_OK = {"h11_important_stock", "h20_potential_promotion",
                  "h22_global_sales", "h16_parts_supplier_cnt"}

_ALL_H = [
    "h02_min_cost_supplier", "h04_priority_check", "h07_volume_shipping",
    "h08_market_share", "h09_product_profit", "h11_important_stock",
    "h13_customer_distribution", "h15_top_supplier",
    "h16_parts_supplier_cnt", "h17_small_quantity_revenue",
    "h19_disjunctive_join", "h20_potential_promotion",
    "h21_waiting_supplier", "h22_global_sales",
]


@pytest.mark.parametrize("name", _ALL_H)
def test_no_cartesian_and_bounded_nested_loop(spark, name):
    p = _plan(spark, name)
    assert "CartesianProduct" not in p
    if name not in _SCALAR_BNL_OK:
        assert "BroadcastNestedLoop" not in p, \
            f"{name}: unexpected nested-loop join"


def test_h21_uses_semi_and_anti_joins(spark):
    """EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti; never a subquery
    re-execution per outer row."""
    p = _plan(spark, "h21_waiting_supplier")
    assert "LeftSemi" in p and "LeftAnti" in p


def test_h16_not_in_is_anti_join(spark):
    p = _plan(spark, "h16_parts_supplier_cnt")
    assert "LeftAnti" in p


def test_h13_outer_join_preserved(spark):
    """The LEFT JOIN must stay outer (customers with zero orders count),
    unlike the decorrelation joins Catalyst legally narrows to inner."""
    p = _plan(spark, "h13_customer_distribution")
    assert "LeftOuter" in p


@pytest.mark.parametrize("name,token", [
    ("h04_priority_check", "o_orderdate"),     # date range into scan
    ("h19_disjunctive_join", "p_partkey"),     # join-key IsNotNull into scan
    ("h09_product_profit", "p_name"),          # LIKE prefix scan handling
])
def test_filters_reach_parquet_scans(spark, name, token):
    p = _plan(spark, name)
    # at least one parquet scan carries pushed filters mentioning the col
    pushed = [seg for seg in p.split("PushedFilters: ")[1:]
              if token in seg.split("]")[0]]
    assert pushed, f"{name}: no pushed filter on {token}"


def test_h02_decorrelated_aggregate_feeds_equi_join(spark):
    """The correlated MAX decorrelates to a grouped aggregate joined on
    the correlation key — visible as a HashAggregate under an equi-join
    keyed on s_nationkey, with no per-row re-execution artifacts."""
    p = _plan(spark, "h02_min_cost_supplier")
    assert "HashAggregate" in p
    assert "s_nationkey" in p
    assert "BroadcastNestedLoop" not in p and "CartesianProduct" not in p
