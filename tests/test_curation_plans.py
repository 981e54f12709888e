"""100 TB plan-shape assertions for the corpus-curation queries.

Correctness is oracle-checked (tools/check_correctness); these pin the
physical shapes that keep the ops viable at scale: the decontamination
eval side broadcasts (the train corpus never shuffles for the join),
chunking stays exchange-free, and packing shuffles exactly once (the
bucket repartition feeding applyInPandas).
"""

from __future__ import annotations

from tests.conftest import TESTDATA


def _plan(spark, name):
    import __spark_entry__ as entry
    df = entry.queries()[name](spark, TESTDATA)
    return df._jdf.queryExecution().executedPlan().toString()


def test_d28_decontaminate_broadcasts_eval_grams(spark):
    p = _plan(spark, "d28_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_d29_chunking_is_exchange_free(spark):
    assert "Exchange" not in _plan(spark, "d29_chunking")


def test_d31_packing_single_shuffle(spark):
    p = _plan(spark, "d31_seq_packing")
    # exactly one hashpartitioning exchange: the bucket key feeding the
    # applyInPandas group (AQE may wrap it, so count occurrences)
    assert p.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in p


def test_d33_incremental_dedup_no_cartesian(spark):
    p = _plan(spark, "d33_incremental_dedup")
    assert "CartesianProduct" not in p
    # corpus-vs-batch stages are anti joins on fingerprint / doc id
    assert "LeftAnti" in p


# ---------------------------------------------------------------------------
# round-7 additions: HLL, triangles, PQ
# ---------------------------------------------------------------------------

def test_d76_hll_join_free_two_level_agg(spark):
    """The sketch is groupBy-max over a pure row function: no joins of
    any kind, and the full-plan exchange count stays at 3 (register
    agg, estimate agg, final orderBy) no matter the input size — the
    shuffle carries at most groups x 2^p register rows."""
    p = _plan(spark, "d76_hll_distinct")
    assert "Join" not in p
    assert p.count("Exchange") <= 3


def test_d77_triangles_no_cartesian_bounded_plan(spark):
    """Wedge build + closure probe are equi joins only; the oriented
    edge frame is materialized ONCE (localCheckpoint), so its
    dedupe+degree lineage must appear as scans of an RDD, not as three
    repeated pipelines (77 exchanges -> ~20, measured r7)."""
    p = _plan(spark, "d77_triangle_counts")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Scan ExistingRDD" in p
    assert p.count("Exchange") < 40


def test_d79_pq_broadcast_only_no_smj(spark):
    """Codebook and query-distance table are tiny broadcasts; the
    corpus side never sort-merge-joins or cartesians — the scan side
    of both joins is the (compressed) code stream."""
    p = _plan(spark, "d79_pq_adc")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
