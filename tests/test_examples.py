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
