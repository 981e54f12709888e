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


def quantize(c, mn, mx, scale: int, top: int):
    """Clamped equi-width quantizer shared by the Z-order key
    (scale == top == 2^bits - 1: the max value maps to the top cell)
    and histograms (scale == nbins, top == nbins - 1: the closed upper
    edge folds into the last bin). One definition so NULL/NaN/edge
    policy can never drift between the two (review r5): NULL in ->
    NULL out; NaN reaches the floor-to-bigint cast, which errors under
    ANSI mode — filter NaN upstream if the column can carry it."""
    if not mx > mn:
        raise ValueError(f"degenerate bounds ({mn}, {mx})")
    x = ((c.cast("double") - F.lit(float(mn)))
         / F.lit(float(mx) - float(mn)) * F.lit(float(scale)))
    return F.least(F.greatest(F.floor(x).cast("bigint"), F.lit(0)),
                   F.lit(top))


def zorder_key(cols: Sequence, bounds: Sequence, bits: int = 16):
    """Z-order (Morton) key: quantize each column to ``bits`` levels
    inside its caller-supplied [min, max] bounds, then interleave the
    bits — points close in EVERY dimension get close keys, so
    range-partitioning by this key clusters multi-dimensional
    neighborhoods into the same files (the Delta/Iceberg OPTIMIZE
    ZORDER layout, here as a plain column expression any write can
    sort by).

    Bounds are explicit (not probed) so the key is a pure deterministic
    function of the row — reclustering a grown table with the same
    bounds keeps keys comparable across rewrites. Out-of-bounds values
    clamp to the edge cells. Pure built-ins (floor/shift/and), so the
    whole key computes inside codegen; the DuckDB twin in d52 runs the
    identical arithmetic.
    """
    if not cols or len(cols) != len(bounds):
        raise ValueError("need one (min, max) bound per column")
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds a signed 64-bit key")
    ncols = len(cols)
    top = (1 << bits) - 1
    quantized = [quantize(c, mn, mx, scale=top, top=top)
                 for c, (mn, mx) in zip(cols, bounds)]
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for ci, qcol in enumerate(quantized):
            key = key + F.shiftleft(
                F.shiftright(qcol, i).bitwiseAND(F.lit(1)),
                i * ncols + ci)
    return key


def zorder_cluster(df: DataFrame, cols: Sequence[str],
                   bounds: Sequence, num_partitions: int,
                   bits: int = 16, key_col: str = "_zkey") -> DataFrame:
    """Cluster rows for writing: range-partition + sort by the Z-order
    key of ``cols``. Each output partition covers a compact
    multi-dimensional tile, so per-file min/max statistics prune scans
    filtered on ANY prefix or subset of the dimensions — the layout
    step before ``.write`` that makes 100 TB point/range lookups read
    a handful of files. The key column is kept (drop it after writing
    if the format should not carry it; keeping it enables key-range
    file pruning)."""
    if key_col in df.columns:
        raise ValueError(f"{key_col!r} already exists; pass key_col=")
    out = df.withColumn(
        key_col, zorder_key([F.col(c) for c in cols], bounds, bits))
    return (out.repartitionByRange(num_partitions, F.col(key_col))
            .sortWithinPartitions(key_col))
