"""Deterministic sampling / splitting operators (operators/sampling.py).

Key properties pinned: partitioning-invariance (the whole point — a
100 TB corpus is sampled identically however it is laid out), exact
quotas, complete+disjoint splits, stable shuffle order.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_federation_spark.operators import sampling
from tests.conftest import TESTDATA


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


def test_hash_sample_partitioning_invariant(spark, docs):
    """Same sample ids regardless of input partitioning (both hash
    backends) — no RNG, no partition-index dependence."""
    for method in ("xxhash64", "md5"):
        a = sampling.hash_sample(docs, "doc_id", 0.25, method=method)
        b = sampling.hash_sample(docs.repartition(13), "doc_id", 0.25,
                                 method=method)
        ids_a = sorted(r[0] for r in a.select("doc_id").collect())
        ids_b = sorted(r[0] for r in b.select("doc_id").collect())
        assert ids_a == ids_b
        n = docs.count()
        assert 0 < len(ids_a) < n
        # hash uniformity: within a loose band of the target fraction
        assert 0.1 * n < len(ids_a) < 0.45 * n


def test_hash_sample_is_subset_and_idempotent(spark, docs):
    s1 = sampling.hash_sample(docs, "doc_id", 0.3)
    s2 = sampling.hash_sample(s1, "doc_id", 0.3)
    # sampling a sample at the same frac with the same key is a no-op
    # (the predicate is deterministic per key)
    assert s2.count() == s1.count()


def test_quota_per_group_exact(spark, docs):
    out = sampling.quota_per_group(docs, "lang", 3, "doc_id")
    per = dict(out.groupBy("lang").count().collect())
    full = dict(docs.groupBy("lang").count().collect())
    for lang, n in full.items():
        assert per.get(lang, 0) == min(3, n)
    # deterministic pick: same rows on a different partitioning
    out2 = sampling.quota_per_group(docs.repartition(7), "lang", 3,
                                    "doc_id")
    assert sorted(r[0] for r in out.select("doc_id").collect()) \
        == sorted(r[0] for r in out2.select("doc_id").collect())


def test_assign_splits_complete_and_disjoint(spark, docs):
    out = sampling.assign_splits(
        docs, "doc_id", {"test": 0.1, "val": 0.1, "train": 0.8})
    assert out.filter(F.col("split").isNull()).count() == 0
    counts = dict((r[0], r[1]) for r in
                  out.groupBy("split").count().collect())
    n = docs.count()
    assert sum(counts.values()) == n          # complete, one split each
    assert counts["train"] > counts.get("test", 0)
    # weights must sum to 1
    with pytest.raises(ValueError):
        sampling.assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.2})


@pytest.mark.parametrize("method", ["xxhash64", "md5"])
def test_sample_then_split_proportions(spark, method):
    """ADVICE r4 (high): hash_sample then assign_splits on the SAME
    unsalted hash were fully correlated — frac=0.1 sampling followed by
    a {test:.05, val:.05, train:.9} split left train EMPTY (every
    sampled row sits below the 10th hash percentile, all swallowed by
    test/val). The per-purpose 'split' salt makes the assignment an
    independent draw: proportions must track the nominal weights."""
    df = spark.range(20000).withColumnRenamed("id", "k")
    s = sampling.hash_sample(df, "k", 0.1, method=method)
    out = sampling.assign_splits(
        s, "k", {"test": 0.05, "val": 0.05, "train": 0.9}, method=method)
    counts = dict((r[0], r[1]) for r in
                  out.groupBy("split").count().collect())
    n = sum(counts.values())
    assert n > 1000                      # the sample itself is ~2000
    # train takes ~90%; the correlated bug gave it exactly 0
    assert counts.get("train", 0) > 0.8 * n
    for small in ("test", "val"):
        assert 0.01 * n < counts.get(small, 0) < 0.12 * n


def test_prepare_and_split_proportions(spark):
    """End-to-end repro of the ADVICE scenario through the composed
    corpus pipeline: sample_frac + splits must yield all three splits
    at roughly their nominal weights."""
    from datafusion_federation_spark.operators.pipeline import (
        CorpusPrepConfig, prepare_and_split)
    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    out = prepare_and_split(
        docs, CorpusPrepConfig(min_quality=0.0), sample_frac=0.5,
        splits={"test": 0.1, "val": 0.1, "train": 0.8})
    counts = dict((r[0], r[1]) for r in
                  out.groupBy("split").count().collect())
    n = sum(counts.values())
    assert n > 50
    assert counts.get("train", 0) > 0.6 * n
    assert counts.get("test", 0) > 0
    assert counts.get("val", 0) > 0


def test_assign_splits_stable_across_runs(spark, docs):
    a = sampling.assign_splits(docs, "doc_id",
                               {"val": 0.2, "train": 0.8})
    b = sampling.assign_splits(docs.repartition(5), "doc_id",
                               {"val": 0.2, "train": 0.8})
    da = {r[0]: r[1] for r in a.select("doc_id", "split").collect()}
    db = {r[0]: r[1] for r in b.select("doc_id", "split").collect()}
    assert da == db


def test_deterministic_shuffle_stable_order(spark, docs):
    a = [r[0] for r in sampling.deterministic_shuffle(docs, "doc_id")
         .select("doc_id").collect()]
    b = [r[0] for r in sampling.deterministic_shuffle(
            docs.repartition(9), "doc_id").select("doc_id").collect()]
    assert a == b
    assert a != sorted(a)      # actually shuffled, not id order
    assert sorted(a) == sorted(set(a))   # a permutation, no dup/loss


def test_deterministic_shuffle_partitioned_variant(spark, docs):
    out = sampling.deterministic_shuffle(docs, "doc_id",
                                         num_partitions=4)
    assert out.rdd.getNumPartitions() == 4
    # per-partition sortedness by the hash
    hashes = out.select(F.xxhash64("doc_id").alias("h")) \
        .rdd.mapPartitions(lambda it: [[r["h"] for r in it]]).collect()
    for part in hashes:
        assert part == sorted(part)


def test_write_training_shards_deterministic(spark, docs, tmp_path):
    from pyspark.sql import functions as F
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    sampling.write_training_shards(docs, p1, "doc_id", 4)
    sampling.write_training_shards(docs.repartition(11), p2, "doc_id", 4)
    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    # identical shard membership regardless of input partitioning
    sa = sorted(map(tuple, a.select("doc_id", "shard").collect()))
    sb = sorted(map(tuple, b.select("doc_id", "shard").collect()))
    assert sa == sb
    assert a.count() == docs.count()
    # every shard id present, membership matches the hash contract
    shards = {r[0] for r in a.select("shard").distinct().collect()}
    assert shards == {0, 1, 2, 3}
    bad = a.filter(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4)) != F.col("shard"))
    assert bad.count() == 0


def test_hash_sample_md5_full_fraction(spark, docs):
    """frac ~ 1.0 in md5 mode: format(256,'02x') is the 3-char '100'
    which lexicographically excludes most 2-hex prefixes — the operator
    must return the whole corpus instead."""
    n = docs.count()
    assert sampling.hash_sample(docs, "doc_id", 1.0, method="md5") \
        .count() == n
    assert sampling.hash_sample(docs, "doc_id", 0.999, method="md5") \
        .count() == n


def test_assign_splits_md5_cumulative_one(spark, docs):
    """A non-final cumulative weight reaching 1.0 must absorb everything
    up to it (the '100' hex-bound case), leaving later splits empty."""
    out = sampling.assign_splits(
        docs, "doc_id", {"train": 0.999, "val": 0.001}, method="md5")
    counts = dict((r[0], r[1]) for r in
                  out.groupBy("split").count().collect())
    n = docs.count()
    # 0.999*256 rounds to 256 -> train takes all rows
    assert counts.get("train", 0) == n and counts.get("val", 0) == 0


# ---------------------------------------------------------------------------
# property-based invariants (hypothesis; tiny frame, few examples — each
# draw runs Spark jobs)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(f1=st.floats(0.05, 0.95), f2=st.floats(0.05, 0.95),
       method=st.sampled_from(["xxhash64", "md5"]))
def test_hash_sample_monotone(spark, f1, f2, method):
    """frac1 <= frac2 implies sample(frac1) is a SUBSET of sample(frac2)
    (thresholded hashes are monotone) — the property that makes nested
    ablation runs consistent (a 10% corpus is inside the 20% corpus)."""
    lo, hi = sorted([f1, f2])
    df = spark.range(200).withColumnRenamed("id", "k")
    a = {r[0] for r in sampling.hash_sample(df, "k", lo, method=method)
         .collect()}
    b = {r[0] for r in sampling.hash_sample(df, "k", hi, method=method)
         .collect()}
    assert a <= b


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(w=st.lists(st.floats(0.05, 1.0), min_size=2, max_size=4),
       method=st.sampled_from(["xxhash64", "md5"]))
def test_assign_splits_partition_property(spark, w, method):
    """For any normalized weight vector the splits PARTITION the corpus:
    every row assigned, assignments drawn only from the split names."""
    total = sum(w)
    splits = {f"s{i}": v / total for i, v in enumerate(w)}
    df = spark.range(100).withColumnRenamed("id", "k")
    out = sampling.assign_splits(df, "k", splits, method=method)
    rows = out.collect()
    assert len(rows) == 100
    assert {r["split"] for r in rows} <= set(splits)


def test_shard_manifest_detects_change(spark, docs, tmp_path):
    """Manifests of identical writes match; dropping one row changes
    exactly that row's shard (count + digest) and nothing else."""
    p1, p2, p3 = (str(tmp_path / d) for d in ("w1", "w2", "w3"))
    sampling.write_training_shards(docs, p1, "doc_id", 4)
    sampling.write_training_shards(docs, p2, "doc_id", 4)
    one = docs.limit(1).collect()[0]["doc_id"]
    sampling.write_training_shards(
        docs.filter(F.col("doc_id") != one), p3, "doc_id", 4)
    m1 = sorted(map(tuple,
                    sampling.shard_manifest(spark, p1,
                                            "doc_id").collect()))
    m2 = sorted(map(tuple,
                    sampling.shard_manifest(spark, p2,
                                            "doc_id").collect()))
    m3 = sorted(map(tuple,
                    sampling.shard_manifest(spark, p3,
                                            "doc_id").collect()))
    assert m1 == m2
    assert m1 != m3
    assert sum(a != b for a, b in zip(m1, m3)) == 1


class TestNegativePairs:
    def _df(self, spark, n=50):
        from pyspark.sql import functions as F
        return spark.range(n).select((F.col("id") * 10).alias("doc"))

    def test_shape_and_no_self_draws(self, spark):
        from datafusion_federation_spark.operators.sampling import (
            negative_pairs)
        out = negative_pairs(self._df(spark), "doc", k=3).collect()
        assert len(out) == 50 * 3
        for r in out:
            assert r.neg_id != r.anchor_id
        # every anchor has exactly k draws
        from collections import Counter
        c = Counter(r.anchor_id for r in out)
        assert set(c.values()) == {3}

    def test_partition_layout_invariant(self, spark):
        from datafusion_federation_spark.operators.sampling import (
            negative_pairs)
        df = self._df(spark)
        a = sorted(map(tuple, negative_pairs(
            df.coalesce(1), "doc", k=2).collect()))
        b = sorted(map(tuple, negative_pairs(
            df.repartition(7, "doc"), "doc", k=2).collect()))
        assert a == b

    def test_rejects_bad_k(self, spark):
        import pytest
        from datafusion_federation_spark.operators.sampling import (
            negative_pairs)
        with pytest.raises(ValueError, match="k must be"):
            negative_pairs(self._df(spark), "doc", k=0)


class TestWeightedHashSample:
    def _docs(self, spark, n=2000):
        from pyspark.sql import functions as F
        # weights spread over (0, 2]: some rows saturate at always-keep
        return spark.range(n).select(
            F.col("id").alias("doc"),
            ((F.col("id") % 20).cast("double") / 10.0 + 0.05)
            .alias("w"))

    def test_rate_tracks_weight(self, spark):
        from datafusion_federation_spark.operators.sampling import (
            weighted_hash_sample)
        df = self._docs(spark)
        kept = weighted_hash_sample(df, "doc", "w", 0.5)
        # empirical rate ~ E[min(1, 0.5w)] = mean over the 20 weight
        # levels; tolerance 4 sigma for n=2000
        import math
        levels = [i / 10.0 + 0.05 for i in range(20)]
        p = sum(min(1.0, 0.5 * w) for w in levels) / 20
        n, k = df.count(), kept.count()
        assert abs(k / n - p) < 4 * math.sqrt(p * (1 - p) / n)

    def test_saturated_weight_always_keeps(self, spark):
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.sampling import (
            weighted_hash_sample)
        df = spark.range(100).select(F.col("id").alias("doc"),
                                     F.lit(5.0).alias("w"))
        assert weighted_hash_sample(df, "doc", "w", 0.5).count() == 100

    def test_monotone_in_weight(self, spark):
        # doubling every weight can only ADD rows (same hash, larger
        # threshold) — the property that makes reweighting reproducible
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.sampling import (
            weighted_hash_sample)
        df = self._docs(spark, 500)
        low = {r.doc for r in weighted_hash_sample(
            df, "doc", "w", 0.3).collect()}
        high = {r.doc for r in weighted_hash_sample(
            df.withColumn("w", F.col("w") * 2), "doc", "w",
            0.3).collect()}
        assert low <= high

    def test_layout_invariant_and_methods_disagree_only_on_draws(
            self, spark):
        from datafusion_federation_spark.operators.sampling import (
            weighted_hash_sample)
        df = self._docs(spark, 500)
        a = sorted(r.doc for r in weighted_hash_sample(
            df.coalesce(1), "doc", "w", 0.4).collect())
        b = sorted(r.doc for r in weighted_hash_sample(
            df.repartition(7, "doc"), "doc", "w", 0.4).collect())
        assert a == b
        # xxhash64 path: same CONTRACT, different draws; rate comparable
        c = weighted_hash_sample(df, "doc", "w", 0.4,
                                 method="xxhash64").count()
        assert abs(c - len(a)) < 0.25 * max(len(a), 1) + 30

    def test_rejects_bad_frac(self, spark):
        import pytest
        from datafusion_federation_spark.operators.sampling import (
            weighted_hash_sample)
        with pytest.raises(ValueError, match="base_frac"):
            weighted_hash_sample(self._docs(spark, 10), "doc", "w", 0.0)


class TestDenseIndex:
    def test_equals_window_row_number(self, spark):
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.sampling import (
            dense_index)
        df = spark.range(500).select((F.col("id") * 7 % 1000)
                                     .alias("doc")).distinct()
        want = {(r.doc, r.i) for r in df.withColumn(
            "i", F.row_number().over(W.orderBy("doc")) - 1).collect()}
        got = {(r.doc, r._np_idx)
               for r in dense_index(df, "doc").collect()}
        assert got == want

    def test_layout_invariant(self, spark):
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.sampling import (
            dense_index)
        df = spark.range(300).select(F.col("id").alias("doc"))
        a = sorted(map(tuple, dense_index(
            df.coalesce(1), "doc", num_partitions=3).collect()))
        b = sorted(map(tuple, dense_index(
            df.repartition(11), "doc", num_partitions=7).collect()))
        assert a == b

    def test_negative_pairs_distributed_index_same_pairs(self, spark):
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.sampling import (
            negative_pairs)
        df = spark.range(80).select((F.col("id") * 3).alias("doc"))
        a = sorted(map(tuple, negative_pairs(
            df, "doc", k=3).collect()))
        b = sorted(map(tuple, negative_pairs(
            df, "doc", k=3, index="distributed").collect()))
        assert a == b


def test_mix_corpora_layout_invariant_and_validated(spark):
    from datafusion_federation_spark.operators.sampling import mix_corpora
    import pytest as _pt
    df = spark.createDataFrame([(i, f"t{i}") for i in range(200)],
                               "doc_id long, text string")
    srcs = [("a", df, 1.0), ("b", df, 0.5)]
    one = sorted(map(tuple, mix_corpora(
        srcs, "doc_id", method="md5").collect()))
    srcs7 = [("a", df.repartition(7), 1.0),
             ("b", df.repartition(3), 0.5)]
    other = sorted(map(tuple, mix_corpora(
        srcs7, "doc_id", method="md5").collect()))
    assert one == other and one
    # per-source salts decorrelate: b's kept set is NOT simply the
    # low-hash half that an unsalted threshold would share with any
    # other 0.5 decision — compare against a different source name
    srcs_c = [("c", df, 0.5)]
    kept_b = {r.doc_id for r in mix_corpora(
        [("b", df, 0.5)], "doc_id", method="md5").collect()}
    kept_c = {r.doc_id for r in mix_corpora(
        srcs_c, "doc_id", method="md5").collect()}
    assert kept_b != kept_c
    with _pt.raises(ValueError, match="rate"):
        mix_corpora([("x", df, 0.0)], "doc_id")
    with _pt.raises(ValueError, match="non-empty"):
        mix_corpora([], "doc_id")
    with _pt.raises(ValueError, match="mix_source"):
        mix_corpora([("x", df.withColumn("mix_source", F.lit("z")),
                      0.5)], "doc_id")


# ---------------------------------------------------------------------------
# IPF / raking mixing weights (r8)
# ---------------------------------------------------------------------------

def test_ipf_uniform_marginals_converge(spark):
    from datafusion_federation_spark.operators.sampling import (
        ipf_mixing_weights)
    rows = [("a", "x")] * 8 + [("a", "y")] * 2 + \
           [("b", "x")] * 3 + [("b", "y")] * 7
    df = spark.createDataFrame(rows, "src STRING, lng STRING")
    out = ipf_mixing_weights(df, "src", "lng", iters=20).collect()
    tot = sum(r.expected for r in out)
    assert abs(tot - 20) < 1e-6
    by_src, by_lng = {}, {}
    for r in out:
        by_src[r.src] = by_src.get(r.src, 0) + r.expected
        by_lng[r.lng] = by_lng.get(r.lng, 0) + r.expected
    for v in by_src.values():
        assert abs(v - 10) < 1e-6          # tot / n_src
    for v in by_lng.values():
        assert abs(v - 10) < 1e-6


def test_ipf_custom_targets(spark):
    from datafusion_federation_spark.operators.sampling import (
        ipf_mixing_weights)
    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + \
           [("b", "x")] * 5 + [("b", "y")] * 5
    df = spark.createDataFrame(rows, "src STRING, lng STRING")
    out = ipf_mixing_weights(
        df, "src", "lng", iters=25,
        row_targets={"a": 15.0, "b": 5.0},
        col_targets={"x": 12.0, "y": 8.0}).collect()
    by_src, by_lng = {}, {}
    for r in out:
        by_src[r.src] = by_src.get(r.src, 0) + r.expected
        by_lng[r.lng] = by_lng.get(r.lng, 0) + r.expected
    assert abs(by_src["a"] - 15) < 1e-6 and abs(by_src["b"] - 5) < 1e-6
    assert abs(by_lng["x"] - 12) < 1e-6 and abs(by_lng["y"] - 8) < 1e-6


def test_ipf_single_cell_identity(spark):
    from datafusion_federation_spark.operators.sampling import (
        ipf_mixing_weights)
    df = spark.createDataFrame([("a", "x")] * 4, "src STRING, lng STRING")
    out = ipf_mixing_weights(df, "src", "lng", iters=3).collect()
    assert len(out) == 1
    assert abs(out[0].expected - 4) < 1e-9
    assert abs(out[0].weight - 1) < 1e-9


def test_ipf_rejects_zero_iters(spark):
    import pytest as _pt
    from datafusion_federation_spark.operators.sampling import (
        ipf_mixing_weights)
    df = spark.createDataFrame([("a", "x")], "src STRING, lng STRING")
    with _pt.raises(ValueError, match="iters"):
        ipf_mixing_weights(df, "src", "lng", iters=0)


def test_ipf_weights_compose_with_weighted_resample(spark):
    # end-to-end rebalance: IPF weights -> weighted_hash_sample; the
    # realized language marginals must move TOWARD uniform (the
    # deterministic Bernoulli keeps min(1, frac*w) cap the heavy cells
    # and keep the light ones)
    from datafusion_federation_spark.operators.sampling import (
        ipf_mixing_weights, weighted_hash_sample)
    from datafusion_federation_spark.queries import t
    from pyspark.sql import functions as F
    docs = t(spark, "/root/testdata/sf0.001", "documents")
    w = ipf_mixing_weights(docs, "source", "lang", iters=8)
    dfw = docs.join(F.broadcast(w.select("source", "lang", "weight")),
                    ["source", "lang"])
    kept = weighted_hash_sample(dfw, "doc_id", "weight", 0.5)
    before = {r.lang: r.c for r in
              docs.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    after = {r.lang: r.c for r in
             kept.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    def spread(d):
        vs = sorted(d.values())
        return vs[-1] / max(vs[0], 1)
    assert spread(after) <= spread(before), \
        f"rebalance made marginals WORSE: {before} -> {after}"
    # and determinism: same inputs -> same rows
    again = weighted_hash_sample(dfw, "doc_id", "weight", 0.5)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == \
        sorted(r.doc_id for r in again.select("doc_id").collect())
