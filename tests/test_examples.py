"""Every example script's main() runs against the shared session — the
examples are living documentation and must not rot."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

from tests.conftest import TESTDATA


def test_two_engine_demo(spark):
    from two_engine_demo import main
    rows = main(spark, TESTDATA)
    assert rows and rows[0]["weight"] == 5


def test_flight_demo(spark):
    from flight_demo import main
    rows = main(spark, TESTDATA)
    assert rows and sum(r["n"] for r in rows) > 0


def test_corpus_pipeline_demo(spark):
    from corpus_pipeline_demo import main
    final = main(spark, TESTDATA)
    assert "text" in final.columns


def test_training_data_demo(spark):
    from training_data_demo import main
    split_sizes = main(spark, TESTDATA)
    assert split_sizes.get("train", 0) > 0


def test_curation_demo(spark):
    from curation_demo import main
    n_sequences = main(spark, TESTDATA)
    assert n_sequences > 0


def test_temporal_demo(spark):
    from temporal_demo import main
    n_attr = main(spark, TESTDATA)
    assert n_attr > 0


def test_registry_window_contract():
    """Driver-contract hygiene: every SECONDARY name must exist in the
    registry (a typo would silently promote nothing), the recorded
    window (first 50 queries()) must be fully oracle-backed, and no
    registered query may be missing from the ordered listing."""
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from datafusion_federation_spark.queries import REGISTRY, SECONDARY

    assert SECONDARY <= set(REGISTRY), SECONDARY - set(REGISTRY)
    names = list(e.queries())
    assert sorted(names) == sorted(REGISTRY)
    oracles = e.oracle_sql()
    window = names[:50]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"oracle-less rows in the recorded window: {missing}"
    # rows-only queries are intentional and few
    rows_only = [n for n in names if n not in oracles]
    assert set(rows_only) == {"d04_minhash_lsh", "d05_simhash",
                              "d12_winnow_fingerprint", "d14_ivf_ann"}


def test_graph_sketch_demo(spark):
    """Non-vacuous (review r7): the co-purchase graph must actually
    have edges, PageRank must rank someone, and the sketch estimates
    must land within the estimators' error bands of exact counts."""
    from graph_sketch_demo import main
    out = main(spark, TESTDATA)
    assert out["n_edges"] > 0
    assert out["pagerank_top"] and out["pagerank_top"][0][1] > 0
    for et, n in out["exact"].items():
        assert abs(out["hll"][et] - n) / max(n, 1) < 0.6, (et, out)
        assert abs(out["kmv"][et] - n) / max(n, 1) < 0.6, (et, out)


def test_writeback_demo(spark):
    """r12: the write-back demo's four DML statements all run remotely
    and the final table reflects CTAS - DELETE + UPDATE + INSERT."""
    from writeback_demo import main
    rows = main(spark, TESTDATA)
    segs = [r["segment"] for r in rows]
    assert "ALL" in segs                     # the INSERT landed
    assert all(r["n_orders"] >= 5 or r["segment"] == "ALL"
               for r in rows)                # the DELETE held
