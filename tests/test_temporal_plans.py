"""100 TB plan-shape pins for the registered temporal/sketch queries:
the shapes that must never regress are the ABSENCE of quadratic join
strategies — no cartesian products, no unbounded broadcast-nested-loop
— and the as-of path staying join-free."""

from __future__ import annotations

import pytest

import datafusion_federation_spark.queries_pipeline  # noqa: F401
from datafusion_federation_spark.queries import REGISTRY
from tests.conftest import TESTDATA


def _plan(spark, name):
    fn, _ = REGISTRY[name]
    return fn(spark, TESTDATA)._jdf.queryExecution().executedPlan() \
        .toString()


@pytest.mark.parametrize("name", [
    "d40_asof_attribution", "d41_interval_containment",
    "d44_interval_overlap", "d49_trailing_window",
])
def test_no_quadratic_joins(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_d40_asof_section_is_join_free(spark):
    # the whole d40 topology: two filtered scans, the dedup groupBy,
    # the as-of window, the final per-user aggregate — NO join operator
    # anywhere (the 1-row count joins AQE sometimes inserts would still
    # name a Join node; there must be none)
    plan = _plan(spark, "d40_asof_attribution")
    assert "Join" not in plan


def test_d43_sketch_is_distinct_plus_window(spark):
    # the KMV scan side: one distinct aggregate + one ranked window;
    # the exact-count rider joins once (broadcast or shuffled is fine),
    # but nothing quadratic
    plan = _plan(spark, "d43_kmv_distinct")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Window" in plan
