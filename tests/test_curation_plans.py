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
