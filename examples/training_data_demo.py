"""End-to-end training-data flow on the documents fixture:

  hash-sample -> quality gate -> exact dedup -> MinHash near-dedup ->
  enrichment -> train/val/test split -> deterministic shards on disk

Every stage is hash-driven (no RNG): rerunning the script on the same
corpus reproduces the same sample, the same survivors, the same split
assignment, and byte-stable shard membership — the property that makes
a 100 TB pipeline auditable.

Run: python examples/training_data_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(spark=None, sf_dir: str = SF_DIR):
    from pyspark.sql import functions as F

    own_session = spark is None
    if own_session:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("training_data_demo")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")

    from datafusion_federation_spark.operators import sampling
    from datafusion_federation_spark.operators.pipeline import (
        CorpusPrepConfig, prepare_and_split)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = prepare_and_split(
        docs, CorpusPrepConfig(min_quality=0.3), sample_frac=0.5)

    split_sizes = {r["split"]: r["count"] for r in
                   corpus.groupBy("split").count().collect()}
    print("split sizes:", split_sizes)

    # lexical retrieval over the curated corpus (r6): BM25 top-5 for a
    # query-term bag — the hybrid-search partner of the embedding ANN
    from datafusion_federation_spark.operators.text import bm25_scores
    hits = bm25_scores(corpus, "text", "doc_id",
                       ["data", "query", "model"], topk=5).collect()
    print("bm25 top-5:", [(r.doc_id, r.score) for r in hits])

    with tempfile.TemporaryDirectory() as tmp:
        train = corpus.filter(F.col("split") == "train")
        sampling.write_training_shards(
            train, f"{tmp}/shards", "doc_id", num_shards=4)
        back = spark.read.parquet(f"{tmp}/shards")
        shard_sizes = {r["shard"]: r["count"] for r in
                       back.groupBy("shard").count().collect()}
        print("shard sizes:", shard_sizes)
        assert back.count() == train.count()
        # audit manifest: per-shard counts + order-insensitive digests;
        # rerunning the writer on the same corpus rewrites these
        # byte-for-byte (r6: oracle-checked end to end by d67)
        man = sampling.shard_manifest(spark, f"{tmp}/shards", "doc_id")
        print("manifest:", [(r.shard, r.n_rows) for r in man.collect()])

    if own_session:
        spark.stop()
    print("training_data_demo OK")
    return split_sizes


if __name__ == "__main__":
    main()
