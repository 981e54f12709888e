"""Corpus-curation flow on the documents fixture:

  decontaminate vs an eval/benchmark slice -> repetition quality gate ->
  incremental dedup of a new batch vs the curated corpus ->
  chunk to context windows -> pack chunks into token-budget sequences

Every stage is deterministic (hash/n-gram driven, no RNG): rerunning on
the same corpus reproduces identical survivors, chunks, and packed
sequences — auditable end to end at 100 TB.

Run: python examples/curation_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main(spark=None, sf_dir: str = SF_DIR):
    from pyspark.sql import functions as F

    own_session = spark is None
    if own_session:
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[4]")
                 .appName("curation_demo")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")

    from datafusion_federation_spark.operators import curation, dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. decontamination: drop train docs sharing an 8-gram with the
    #    held-out benchmark slice (src18 plays the benchmark here)
    bench = docs.filter(F.col("source") == "src18")
    train = docs.filter(F.col("source") != "src18")
    hits = curation.decontaminate(train, bench, "text", "doc_id", n=8)
    clean = train.join(hits.select("doc_id"), "doc_id", "left_anti")
    n1 = clean.count()

    # 2. repetition quality gate: drop docs where >20% of trigram
    #    occurrences are duplicates (Gopher-style boilerplate signal)
    rep = curation.repetition_stats(clean, "text", "doc_id", n=3)
    bad = rep.filter(F.col("dup_frac") > 0.2).select("doc_id")
    gated = clean.join(bad, "doc_id", "left_anti")
    n2 = gated.count()

    # 3. incremental ingestion: a "new batch" (src1 slice) admitted only
    #    where it survives exact + near-dup checks vs the curated corpus
    batch = gated.filter(F.col("source") == "src1")
    corpus = gated.filter(F.col("source") != "src1")
    admitted = dedup.incremental_dedup(batch, corpus, "text", "doc_id",
                                       n=3, threshold=0.8)
    curated = corpus.unionByName(admitted)
    n3 = curated.count()

    # 4. chunk to 240-char windows with 40 overlap (zero-shuffle)
    chunks = curation.chunk_documents(curated, "text", "doc_id",
                                      chunk_chars=240, overlap=40)
    n4 = chunks.count()

    # 5. pack chunks into 128-token sequences (8 independent buckets)
    # chunk id derived from (doc, idx) — monotonically_increasing_id
    # would vary with partition layout and break replay determinism.
    # 1e6 bound: a doc would need >200M chars at stride 200 to collide
    toks = chunks.select(
        (F.col("doc_id") * 1_000_000 + F.col("chunk_idx"))
        .alias("chunk_id"),
        F.size(F.split("chunk_text", " ")).alias("n_tokens"))
    packed = curation.pack_sequences(toks, "chunk_id", "n_tokens",
                                     budget=128, n_buckets=8)
    n5 = packed.count()
    waste = packed.agg(
        (1 - F.sum("total_tokens") / (F.count("*") * 128)).alias("w")
    ).collect()[0]["w"]

    print(f"corpus {n0} -> decontaminated {n1} -> quality-gated {n2} "
          f"-> +batch merged {n3} docs -> {n4} chunks "
          f"-> {n5} packed sequences (padding waste {waste:.1%})")
    if own_session:
        spark.stop()
    return n5


if __name__ == "__main__":
    main()
