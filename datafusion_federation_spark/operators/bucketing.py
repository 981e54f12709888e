"""Bucketed storage for co-located joins and pre-partitioned LSH probes.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Bucketed
tables (`df.write.bucketBy(n, key)`) persist data pre-hash-partitioned,
so a join between two tables bucketed on the same key with the same
bucket count runs with ZERO exchanges — Spark's scan exposes the
bucketing as the join's required distribution.

Same idea for ANN: write the corpus partitioned by LSH bucket once, and
every query's probe prunes partitions at the file listing level instead
of scanning the corpus.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32,
                   sort_col: Optional[str] = None) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_col`` between tables with identical
    bucketing need no shuffle; sorting additionally enables merge joins
    without a sort step."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: str, how: str = "inner") -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. The
    physical plan contains no Exchange for either side (verified in
    tests) — the join cost is pure local merge/hash work per bucket."""
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, on=on, how=how)


def write_lsh_partitioned(df: DataFrame, path: str, bucket_col: str,
                          fmt: str = "parquet") -> None:
    """Write a corpus physically partitioned by its (already computed)
    LSH bucket column: each probe then reads only the probed partitions
    (partition pruning at file-listing time).

    The shuffle on the bucket column first is load-bearing at scale:
    without it every input task opens a writer for every bucket it sees,
    emitting up to tasks x buckets files — a small-files explosion at
    corpus scale. Repartitioned, each bucket's rows land in one task and
    the output is ~one file per bucket."""
    (df.repartition(F.col(bucket_col))
     .write.mode("overwrite").format(fmt)
     .partitionBy(bucket_col).save(path))


def read_probed(spark: SparkSession, path: str, bucket_col: str,
                probes: Sequence[int], fmt: str = "parquet") -> DataFrame:
    """Read only the probed LSH partitions; the filter is a partition
    filter (no data files outside the probed buckets are opened)."""
    return (spark.read.format(fmt).load(path)
            .filter(F.col(bucket_col).isin(list(probes))))
