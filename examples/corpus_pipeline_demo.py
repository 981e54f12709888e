"""Training-data corpus preparation end to end: quality gate -> exact
dedup -> MinHash near-dedup -> PII redaction -> dup-cluster report.

Run: python examples/corpus_pipeline_demo.py [testdata_dir]
"""

from __future__ import annotations

import sys


def main(spark, sf_dir: str = "/root/testdata/sf0.001"):
    from pyspark.sql import functions as F

    from datafusion_federation_spark.operators import dedup, text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. quality gate (keep docs scoring above the threshold)
    scored = text.quality_score(docs, "text")
    kept = scored.filter(F.col("quality") >= 0.5) \
                 .select(*docs.columns)
    n1 = kept.count()

    # 2. exact dedup (min-id per md5-digest group)
    uniq = dedup.exact_dedup(kept, ["text"], "doc_id")
    n2 = uniq.count()

    # 3. near-dup pairs (MinHash+LSH candidates, exact-Jaccard verified)
    pairs = dedup.minhash_dedup_pairs(uniq, "text", "doc_id",
                                      threshold=0.7)
    # 4. cluster the pairs; drop every non-canonical member
    clusters = dedup.connected_components(pairs)
    losers = clusters.filter(F.col("v") != F.col("label")) \
                     .select(F.col("v").alias("doc_id"))
    final = uniq.join(losers, "doc_id", "left_anti")
    n3 = final.count()

    # 5. PII redaction on the survivors
    final = final.withColumn("text", text.pii_redact(F.col("text")))

    print(f"corpus funnel: {n0} raw -> {n1} quality -> "
          f"{n2} exact-unique -> {n3} near-unique")
    assert n0 >= n1 >= n2 >= n3
    return final


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    main(spark, sys.argv[1] if len(sys.argv) > 1 else
         "/root/testdata/sf0.001")
