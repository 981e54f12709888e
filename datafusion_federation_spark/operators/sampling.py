"""Deterministic sampling / splitting operators for training-data
pipelines: hash-stratified sampling, per-group quotas (class balancing),
train/val/test splits, and a deterministic corpus shuffle.

Everything here is driven by a content hash, never an RNG: rerunning the
pipeline on the same corpus (or on a re-partitioned copy — partition
layout must not matter at 100 TB) selects the same rows. Two hash
backends:

- ``xxhash64`` (default): one JVM long op per row, no materialized
  strings — the 100 TB path.
- ``md5`` prefix: engine-portable (DuckDB computes the identical hex),
  used by the oracle-checked d18-d20 queries. The sampling threshold is
  a hex-string PREFIX comparison, so both engines agree without any
  int(hex) conversion.

Hashes are PURPOSE-SALTED where decisions compose: two thresholded
decisions on the same unsalted hash are fully correlated (a 10% sample
followed by a 5/5/90 split on the same hash leaves train EMPTY — every
surviving row sits below the 10th percentile). assign_splits therefore
salts with 'split' by default; pass distinct salts to any further
hash-keyed stages you add.

All four operators are narrow (no shuffle) except quota_per_group, whose
single window shuffle is inherent to "k per group"; for a skewed group
key combine with operators/skew.py salting.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: 2-hex-digit thresholds give frac granularity of 1/256 — plenty for
#: corpus sampling, and exactly reproducible in any engine with md5.
_HEX2_SPACE = 256


def _hash_col(key: Column, method: str, salt: str | None = None) -> Column:
    """Purpose-salted content hash. Two operators applied to the same
    corpus MUST NOT share an unsalted hash: a sample that keeps
    ``hash < t`` followed by a split that thresholds the SAME hash is
    fully correlated (ADVICE r4: frac=0.1 sampling left the 90% train
    split EMPTY). The salt prefixes the hashed bytes, so each purpose
    draws an independent uniform."""
    if method == "xxhash64":
        if salt is not None:
            return F.xxhash64(F.lit(salt), key)
        return F.xxhash64(key)
    if method == "md5":
        s = key.cast("string")
        if salt is not None:
            s = F.concat(F.lit(salt + ":"), s)
        return F.md5(s)
    raise ValueError(f"unknown hash method {method!r}")


def hash_sample(df: DataFrame, key: str, frac: float,
                method: str = "xxhash64",
                salt: str | None = None) -> DataFrame:
    """Deterministic ~frac sample keyed on `key`'s hash. Narrow (a
    filter — no shuffle, no RNG, independent of partitioning), so at
    100 TB it is a free predicate on the scan. md5 mode rounds frac to
    1/256 granularity (hex-prefix threshold, engine-portable).
    ``salt`` decorrelates this sample from any other hash-keyed decision
    on the same corpus (unsalted default kept for oracle compatibility —
    assign_splits salts itself, so the common sample->split compose is
    safe without one)."""
    k = F.col(key)
    if method == "md5":
        idx = max(0, round(frac * _HEX2_SPACE))
        if idx >= _HEX2_SPACE:
            # frac ~ 1.0: format(256,'02x') is the THREE-char '100' and
            # the 2-char prefix comparison is lexicographic ('ff'<'100'
            # is False) — the whole corpus is the sample, skip the filter
            return df
        bound = format(idx, "02x")
        return df.filter(
            F.substring(_hash_col(k, "md5", salt), 1, 2) < bound)
    # xxhash64: fold the signed 64-bit hash into [0, 1<<32)
    bucket = F.pmod(_hash_col(k, "xxhash64", salt), F.lit(1 << 32))
    return df.filter(bucket < int(frac * (1 << 32)))


def quota_per_group(df: DataFrame, group: str, k: int, key: str,
                    method: str = "xxhash64",
                    salt: str | None = None) -> DataFrame:
    """Class-balanced selection: at most k rows per `group`, chosen in
    deterministic hash order of `key` (ties broken by the key itself).
    ``key`` must be ROW-UNIQUE (a document/primary id): with duplicate
    key values the (hash, key) order cannot total-order the rows and
    the picked rows may vary across runs — exactly the nondeterminism
    this module exists to prevent. One shuffle on the group key — the
    unavoidable cost of an exact per-group quota. Adds no columns."""
    h = _hash_col(F.col(key), method, salt)
    w = W.partitionBy(group).orderBy(h, F.col(key))
    return (df.withColumn("__qr", F.row_number().over(w))
              .filter(F.col("__qr") <= k).drop("__qr"))


def assign_splits(df: DataFrame, key: str, splits: Dict[str, float],
                  method: str = "xxhash64",
                  out_col: str = "split",
                  salt: str | None = "split") -> DataFrame:
    """Deterministic train/val/test assignment: cumulative hash-bucket
    thresholds in the given split order. Weights must sum to 1 (small
    float slack tolerated; the LAST split absorbs the remainder so every
    row is assigned). Narrow — a single CASE column.

    Salted with 'split' BY DEFAULT: an upstream hash_sample keeps only
    low unsalted-hash rows, and thresholding that same hash here would
    stack every sampled row into the first splits (ADVICE r4: the 90%
    train split came back EMPTY after 10% sampling). The salt makes the
    assignment an independent uniform draw; pass salt=None only to
    reproduce the legacy correlated layout."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    names = list(splits)
    if method == "md5":
        h2 = F.substring(_hash_col(F.col(key), "md5", salt), 1, 2)
        acc, expr = 0.0, None
        for name in names[:-1]:
            acc += splits[name]
            idx = round(acc * _HEX2_SPACE)
            if idx >= _HEX2_SPACE:
                # cumulative weight reached 1.0: a 2-hex prefix is
                # always < the 3-char '100' string lexicographically
                # ONLY for '0x'/'10' prefixes — use an always-true
                # condition instead so this and earlier splits absorb
                # everything as the weights demand
                cond = F.lit(True)
            else:
                cond = h2 < format(idx, "02x")
            expr = (F.when(cond, name) if expr is None
                    else expr.when(cond, name))
    else:
        bucket = F.pmod(_hash_col(F.col(key), "xxhash64", salt),
                        F.lit(1 << 32))
        acc, expr = 0.0, None
        for name in names[:-1]:
            acc += splits[name]
            cond = bucket < int(acc * (1 << 32))
            expr = (F.when(cond, name) if expr is None
                    else expr.when(cond, name))
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, last)


def deterministic_shuffle(df: DataFrame, key: str,
                          num_partitions: int | None = None) -> DataFrame:
    """Stable global shuffle for training-order randomization: range-
    partition + sort by the key hash. Same corpus -> same order, any
    input partitioning. At 100 TB this is one range-exchange (sampled
    boundaries), the same cost as any global sort; downstream writers
    should write partition-per-file to keep the order addressable."""
    h = F.xxhash64(F.col(key))
    if num_partitions:
        return df.repartitionByRange(num_partitions, h) \
                 .sortWithinPartitions(h, F.col(key))
    return df.orderBy(h, F.col(key))


def _shard_hash(key: str, method: str) -> F.Column:
    """int64 shard hash of a key column: ``xxhash64`` (JVM fast path)
    or the engine-portable 60-bit md5-prefix (``CAST(concat('0x',
    substr(md5(k),1,15)) AS BIGINT)`` on DuckDB — d67 oracle-checks the
    whole shard layout through it)."""
    if method == "xxhash64":
        return F.xxhash64(F.col(key))
    if method == "md5":
        return F.conv(F.substring(F.md5(F.col(key).cast("string")),
                                  1, 15), 16, 10).cast("bigint")
    raise ValueError(f"unknown hash method {method!r}")


def write_training_shards(df: DataFrame, path: str, key: str,
                          num_shards: int, fmt: str = "parquet",
                          compression: str | None = None,
                          method: str = "xxhash64") -> None:
    """Materialize a training corpus as `num_shards` deterministic
    shards: rows land in shard ``pmod(xxhash64(key), num_shards)`` and
    are sorted by the key hash WITHIN each shard, so the written layout
    (shard membership AND intra-shard order) is a pure function of the
    data — rerunning on the same corpus rewrites identical shards, and
    a trainer streaming shard-by-shard sees a stable, shuffled order.

    One repartition on the shard id is the only wide stage; the sort is
    per-partition (no global exchange). At 100 TB pick num_shards so a
    shard is a few hundred MB: small enough to stream, large enough to
    amortize file overhead. partitionBy writes shard=N subdirectories
    so a reader can parallelize or subset by shard.

    The exchange hashes the shard id into 4x num_shards partitions:
    hashing n distinct ids into exactly n buckets leaves ~1/e of the
    write tasks empty and stacks 2-3 shards on others (stragglers);
    4x over-partitioning keeps each shard in ONE task (the order
    guarantee) while cutting the collision rate to ~10% — empty tasks
    cost microseconds, multi-shard stragglers cost wall-clock."""
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column; rename or drop it — "
            "write_training_shards would silently overwrite it")
    hv = _shard_hash(key, method)
    h = F.pmod(hv, F.lit(num_shards))
    w = (df.withColumn("shard", h)
           .repartition(num_shards * 4, "shard")
           .sortWithinPartitions("shard", hv, F.col(key))
           .write.mode("overwrite").partitionBy("shard").format(fmt))
    if compression:
        w = w.option("compression", compression)
    w.save(path)


def shard_manifest(spark, path: str, key: str,
                   method: str = "xxhash64") -> DataFrame:
    """Audit manifest for a shard directory written by
    write_training_shards: one row per shard with its row count and an
    order-insensitive content digest (the BIGINT sum of xxhash64(key)
    — addition commutes, so the digest is identical however the shard
    is read back). Diffing two manifests verifies byte-stable shard
    membership across rewrites without comparing payloads.

    Scale: one scan of the key column only (columnar prune) + one
    per-shard aggregate — the payload never loads."""
    df = spark.read.parquet(path)
    # decimal(38,0) sum: exact and order-insensitive; a bigint sum of
    # 64-bit hashes overflows (ANSI ArithmeticException). ``method``
    # must match the writer's — the digest audits the writer's hash.
    return (df.groupBy("shard")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(_shard_hash(key, method).cast("decimal(38,0)"))
                 .alias("content_digest"))
            .orderBy("shard"))


def negative_pairs(df: DataFrame, id_col: str, k: int,
                   salt: str = "neg", index: str = "window") -> DataFrame:
    """Deterministic contrastive negatives: for every anchor row, pick
    ``k`` pseudo-random OTHER rows (``anchor_id``, ``j`` in 1..k,
    ``neg_id``) — the negative-sampling primitive for embedding /
    contrastive training, with the repo's standard hash-not-RNG
    contract: same corpus -> same pairs, any partition layout.

    Mechanics: rows get a dense 0-based index by ``id_col`` order; the
    j-th negative of an anchor is index ``H(salt:id:j) mod (N-1)``,
    bumped by one when it lands at-or-after the anchor's own index so
    an anchor can never draw itself. One equi-join on the index maps
    back to ids. H is the md5-prefix hash (engine-portable, like
    sampling's md5 mode), so the pairs are DuckDB-reproducible — d45
    oracle-checks the whole construction.

    ``index`` picks the dense-index implementation: ``"window"`` (one
    global row_number — the simple oracle-able anchor, single-partition
    sort) or ``"distributed"`` (``dense_index``'s sort-based
    zipWithIndex — the 100 TB path). Both produce the IDENTICAL
    (id -> idx) map, so the pairs are the same either way (pinned in
    tests); the hash-draw and index join already scale (the join is
    uniform by construction — no skew).

    Collisions: two j's of one anchor may draw the same negative
    (true uniform-with-replacement sampling); dedupe downstream if the
    loss function needs distinct negatives. A single-row corpus has no
    possible negative — the mod-(N-1) hits Spark's ANSI divide-by-zero
    loudly rather than emitting anything.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if index not in ("window", "distributed"):
        raise ValueError(f"index must be window/distributed, "
                         f"got {index!r}")
    # the index frame is referenced by TWO plan branches (anchor frame
    # and the idx->id lookup); Spark replans shared subtrees, so the
    # id->index map is materialized ONCE here (review r5: three
    # branches = three single-partition sorts; the count now reads the
    # raw ids, and the checkpoint covers the remaining two). 16 bytes a
    # row — the one deliberate materialization this operator makes.
    if index == "distributed":
        ix = dense_index(df, id_col).localCheckpoint(eager=False)
    else:
        ix = df.select(F.col(id_col)).withColumn(
            "_np_idx",
            F.row_number().over(W.orderBy(id_col)) - F.lit(1)) \
            .localCheckpoint(eager=False)
    n = df.agg(F.count(F.lit(1)).alias("_np_n"))
    a = (ix.crossJoin(F.broadcast(n))
           .withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(k)))))
    hex15 = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"),
                       F.lit(":"), F.col("j").cast("string"))), 1, 15)
    draw = F.pmod(F.conv(hex15, 16, 10).cast("bigint"),
                  F.col("_np_n") - F.lit(1))
    a = a.withColumn(
        "_np_tgt",
        F.when(draw >= F.col("_np_idx"), draw + 1).otherwise(draw))
    neg = ix.select(F.col(id_col).alias("neg_id"),
                    F.col("_np_idx").alias("_np_tgt"))
    return (a.join(neg, "_np_tgt")
            .select(F.col(id_col).alias("anchor_id"), "j", "neg_id"))


def weighted_hash_sample(df: DataFrame, key: str, weight_col: str,
                         base_frac: float, salt: str = "wsample",
                         method: str = "md5") -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each row with
    probability ``min(1, base_frac * weight)`` — the quality-weighted
    corpus downsampler (keep high-quality documents at a higher rate),
    under the repo's hash-not-RNG contract: same corpus, same weights,
    same keeps, any partition layout.

    The keep decision compares a uniform-from-hash fraction against the
    row's own threshold. ``md5`` mode derives the uniform from the
    leading 60 hash bits exactly like the KMV sketch
    (operators/sketches.py) and is DuckDB-reproducible (d48);
    ``xxhash64`` is the JVM-side fast path (one long op, no hex
    strings). Weights above ``1/base_frac`` saturate at always-keep.
    NULL, negative, and NaN weights all DROP the row silently (the
    strict ``<`` compare is false for every one of them) — validate
    weights upstream if a bad weight should be an error rather than an
    exclusion; this operator will not invent a keep probability for a
    row whose weight is garbage.

    Narrow op: no shuffle, folds into the scan's filter.
    """
    if not 0.0 < base_frac <= 1.0:
        raise ValueError(f"base_frac must be in (0, 1], got {base_frac}")
    if method == "md5":
        hex15 = F.substring(
            F.md5(F.concat(F.lit(salt + ":"),
                           F.col(key).cast("string"))), 1, 15)
        u = (F.conv(hex15, 16, 10).cast("double")
             / F.lit(float(1 << 60)))
    elif method == "xxhash64":
        # signed 64-bit -> uniform [0,1): shift by 2^63, scale by 2^64
        u = ((F.xxhash64(F.lit(salt), F.col(key)).cast("double")
              + F.lit(float(1 << 63))) / F.lit(float(1 << 64)))
    else:
        raise ValueError(f"unknown hash method {method!r}")
    return df.filter(u < F.lit(float(base_frac))
                     * F.col(weight_col).cast("double"))


def dense_index(df: DataFrame, id_col: str,
                num_partitions: int | None = None) -> DataFrame:
    """Cluster-scalable 0-based dense index by ``id_col`` order:
    ``(id, idx)`` with idx = the id's rank in the global sort. The
    distributed replacement for a global row_number window (which
    funnels the corpus through ONE partition) — this is the classic
    sort-based zipWithIndex: range-partition by id, count rows per
    partition, offset each partition by the counts before it, renumber
    locally. Two passes; the only driver-side data is ONE integer per
    partition (metadata, like skew.py's sampled probe — never rows).

    Ids must be unique: with duplicates "the" rank is ill-defined and
    the assignment becomes layout-dependent — exactly what callers use
    this to avoid. Range boundaries are sampled and may vary between
    runs, but the (id -> idx) MAP cannot: idx is a pure function of the
    sorted unique ids, however they are cut into partitions.

    RDD usage is deliberate (the one per-partition imperative step
    DataFrames cannot express); everything upstream/downstream stays
    DataFrame-native.
    """
    n_parts = num_partitions or max(df.rdd.getNumPartitions(), 1)
    parts = (df.select(F.col(id_col))
             .repartitionByRange(n_parts, F.col(id_col))
             .sortWithinPartitions(id_col))

    sizes = dict(parts.rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]).collect())
    offsets, acc = {}, 0
    for i in sorted(sizes):
        offsets[i] = acc
        acc += sizes[i]

    def renumber(i, it):
        base = offsets[i]
        for j, row in enumerate(it):
            yield (row[0], base + j)

    spark = df.sparkSession
    out = spark.createDataFrame(
        parts.rdd.mapPartitionsWithIndex(renumber),
        schema=f"`{id_col}` {df.schema[id_col].dataType.simpleString()}, "
               "_np_idx bigint")
    return out


def mix_corpora(sources, key: str, method: str = "md5",
                salt: str = "mix") -> DataFrame:
    """Deterministic training-mixture assembly: union several corpora,
    each downsampled to its mixture rate — the 'data recipe' step of a
    pretraining pipeline (e.g. 100% wiki + 30% web + 5% logs), under
    the repo's hash-not-RNG contract: same corpora + same rates ->
    same mixture, any partition layout, and a source can be
    regenerated independently without disturbing the others' draws
    (per-source salt).

    ``sources`` is a list of (name, DataFrame, rate) with rate in
    (0, 1]; every frame must share a schema (unionByName). Each row
    carries its source name out, so downstream packing/sharding can
    stratify or audit the realized mixture. Rates are per-source
    INDEPENDENT Bernoulli keeps (salted by source name), not a global
    multinomial — document counts scale with each source's size, the
    standard recipe form.

    Scale: each source's keep decision is a narrow hash filter fused
    into its own scan (no shuffle, no RNG); the union is plan-level
    (no exchange). md5 mode rounds each rate to 1/256 granularity and
    is engine-portable (d74 oracle-checks a three-source mixture).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    out = None
    for name, df, rate in sources:
        if not 0.0 < rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in (0, 1], "
                             f"got {rate}")
        if "mix_source" in df.columns:
            raise ValueError(f"{name!r} already has a 'mix_source' "
                             "column; rename it first")
        part = hash_sample(df, key, rate, method=method,
                           salt=f"{salt}:{name}") \
            .withColumn("mix_source", F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out


def ipf_mixing_weights(df: DataFrame, row_col: str, col_col: str,
                       iters: int = 8,
                       row_targets: Optional[Dict[str, float]] = None,
                       col_targets: Optional[Dict[str, float]] = None
                       ) -> DataFrame:
    """Iterative proportional fitting (raking) over the (row, col)
    contingency table — the classic corpus-mixing primitive: find
    per-cell resampling weights so the weighted corpus matches TARGET
    marginals on BOTH axes at once (e.g. rebalance source x language
    to uniform languages without skewing the source recipe). Uniform
    targets by default; dicts override per value (missing keys get the
    uniform share of the remainder-free total — callers wanting exact
    control pass every key).

    Algorithm: m := n, then alternately m *= target_r / rowsum(m) and
    m *= target_c / colsum(m); converges for any strictly-positive
    table (Sinkhorn). Output columns: (row, col, n, expected, weight)
    with expected = fitted cell mass and weight = expected / n — feed
    ``weight`` to weighted_hash_sample for the deterministic resample.

    Scale posture: the ONE heavy pass is the groupBy building the
    contingency table (map-side combined, one shuffle at any corpus
    size); the fitted table is vocabulary-sized (sources x languages),
    so the iterations are 2*iters window passes over a broadcast-scale
    frame — no driver-side math, no RNG, plan linear in iters. At
    100 TB the table is still tiny; the weights join back as a
    broadcast."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    cells = (df.groupBy(row_col, col_col)
             .agg(F.count("*").cast("double").alias("n")))
    tot = cells.agg(F.sum("n").alias("__tot"),
                    F.countDistinct(row_col).alias("__nr"),
                    F.countDistinct(col_col).alias("__nc"))
    cells = cells.crossJoin(F.broadcast(tot))

    def target(axis_col, mapping, n_axis):
        if mapping is None:
            return F.col("__tot") / F.col(n_axis)
        pairs = []
        for k, v in mapping.items():
            pairs += [F.lit(k), F.lit(float(v))]
        m = F.create_map(*pairs)
        return F.coalesce(m[F.col(axis_col)],
                          F.col("__tot") / F.col(n_axis))

    rt = target(row_col, row_targets, "__nr")
    ct = target(col_col, col_targets, "__nc")
    wr = W.partitionBy(row_col)
    wc = W.partitionBy(col_col)
    cells = cells.withColumn("m", F.col("n"))
    for _ in range(iters):
        cells = cells.withColumn(
            "m", F.col("m") * rt / F.sum("m").over(wr))
        cells = cells.withColumn(
            "m", F.col("m") * ct / F.sum("m").over(wc))
    return cells.select(
        F.col(row_col), F.col(col_col),
        F.col("n").cast("bigint").alias("n"),
        F.col("m").alias("expected"),
        (F.col("m") / F.col("n")).alias("weight"))
