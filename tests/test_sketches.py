"""KMV distinct sketch: exactness below k, accuracy above k, merge
associativity, and partition-layout invariance (the determinism contract
every hash-driven operator in this repo carries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_federation_spark.operators.sketches import (
    kmv_distinct, kmv_merge, kmv_partials)


def _corpus(spark, n_rows, n_distinct, n_groups=2):
    return spark.range(n_rows).select(
        (F.col("id") % n_groups).alias("g"),
        (F.col("id") % n_distinct).alias("v"))


def test_exact_below_k(spark):
    # 3 and 40 are coprime, so every group sees all 40 residues
    df = _corpus(spark, 400, 40, n_groups=3)
    rows = kmv_distinct(df, "v", ["g"], k=128).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.n_kept == 40 and r.est == 40.0


def test_estimate_within_bound_above_k(spark):
    df = _corpus(spark, 30_000, 10_000, n_groups=1)
    r = kmv_distinct(df, "v", ["g"], k=256).collect()[0]
    assert r.n_kept == 256
    # rse ~ 1/sqrt(k-2) = 6.3%; allow 4 sigma for one fixed draw
    assert abs(r.est - 10_000) / 10_000 < 0.25


def test_merge_equals_whole(spark):
    df = _corpus(spark, 5_000, 700, n_groups=3)
    a, b = df.filter("v < 400"), df.filter("v >= 300")  # overlapping!
    merged = kmv_merge(
        kmv_partials(a, "v", ["g"], k=64)
        .unionByName(kmv_partials(b, "v", ["g"], k=64)),
        ["g"], k=64)
    whole = kmv_distinct(df, "v", ["g"], k=64)
    assert sorted(merged.collect()) == sorted(whole.collect())


def test_partition_layout_invariance(spark):
    df = _corpus(spark, 3_000, 500)
    one = kmv_distinct(df.coalesce(1), "v", ["g"], k=32).collect()
    many = kmv_distinct(df.repartition(13, "v"), "v", ["g"],
                        k=32).collect()
    assert sorted(one) == sorted(many)


def test_rejects_tiny_k(spark):
    df = _corpus(spark, 10, 5)
    with pytest.raises(ValueError, match="k must be"):
        kmv_distinct(df, "v", ["g"], k=2)


def test_set_estimates_exact_below_k(spark):
    # A = {0..59}, B = {40..99}: union 100, intersection 20 — all under
    # k, so the sketch algebra must be EXACT
    from pyspark.sql import functions as F
    a = spark.range(60).select(F.lit(1).alias("g"), F.col("id").alias("v"))
    b = spark.range(40, 100).select(F.lit(1).alias("g"),
                                    F.col("id").alias("v"))
    pa = kmv_partials(a, "v", ["g"], k=256)
    pb = kmv_partials(b, "v", ["g"], k=256)
    from datafusion_federation_spark.operators.sketches import (
        kmv_set_estimates)
    r = kmv_set_estimates(pa, pb, ["g"], k=256).collect()[0]
    assert r.union_est == 100.0 and r.intersect_est == 20.0


def test_set_estimates_within_bound_above_k(spark):
    from pyspark.sql import functions as F
    from datafusion_federation_spark.operators.sketches import (
        kmv_set_estimates)
    a = spark.range(6000).select(F.lit(1).alias("g"),
                                 F.col("id").alias("v"))
    b = spark.range(4000, 10000).select(F.lit(1).alias("g"),
                                        F.col("id").alias("v"))
    pa = kmv_partials(a, "v", ["g"], k=256)
    pb = kmv_partials(b, "v", ["g"], k=256)
    r = kmv_set_estimates(pa, pb, ["g"], k=256).collect()[0]
    assert abs(r.union_est - 10_000) / 10_000 < 0.25
    assert abs(r.intersect_est - 2_000) / 2_000 < 0.5  # ratio compounds


def test_set_estimates_one_sided_group_is_null(spark):
    from pyspark.sql import functions as F
    from datafusion_federation_spark.operators.sketches import (
        kmv_set_estimates)
    a = spark.range(50).select(F.lit(1).alias("g"), F.col("id").alias("v"))
    b = spark.range(50).select(F.lit(2).alias("g"), F.col("id").alias("v"))
    pa = kmv_partials(a, "v", ["g"], k=64)
    pb = kmv_partials(b, "v", ["g"], k=64)
    rows = {r.g: (r.union_est, r.intersect_est)
            for r in kmv_set_estimates(pa, pb, ["g"], k=64).collect()}
    assert rows[1] == (None, None) and rows[2] == (None, None)


def test_set_estimates_skewed_small_side_not_null(spark):
    # review r5: |A|=1000 saturates the sketch, B={500} ranks far above
    # the union's k-th min — presence must come from the FULL sketch,
    # not the top-k slice, so estimates are real numbers, not NULL
    from pyspark.sql import functions as F
    from datafusion_federation_spark.operators.sketches import (
        kmv_set_estimates)
    a = spark.range(1000).select(F.lit(1).alias("g"),
                                 F.col("id").alias("v"))
    b = spark.range(500, 501).select(F.lit(1).alias("g"),
                                     F.col("id").alias("v"))
    pa = kmv_partials(a, "v", ["g"], k=8)
    pb = kmv_partials(b, "v", ["g"], k=8)
    r = kmv_set_estimates(pa, pb, ["g"], k=8).collect()[0]
    assert r.union_est is not None
    assert r.intersect_est is not None


class TestCountMin:
    def _df(self, spark):
        from pyspark.sql import functions as F
        # zipf-ish: value v appears (40 - v) times for v in 0..39
        return (spark.range(40)
                .select(F.col("id").alias("v"),
                        F.explode(F.sequence(
                            F.lit(1), 40 - F.col("id"))).alias("_"))
                .select("v"))

    def test_estimates_upper_bound_and_close(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            cm_estimate, cm_sketch)
        df = self._df(spark)
        sk = cm_sketch(df, "v", depth=4, width=512)
        probes = df.select("v").distinct()
        est = {r.v: r.est for r in cm_estimate(
            sk, probes, "v", depth=4, width=512).collect()}
        for v in range(40):
            true = 40 - v
            assert est[v] >= true          # CM never underestimates
            assert est[v] <= true + 40     # and stays near at 512 wide

    def test_merge_by_addition_equals_whole(self, spark):
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.sketches import (
            cm_sketch)
        df = self._df(spark)
        a, b = df.filter("v < 25"), df.filter("v >= 25")
        merged = (cm_sketch(a, "v").unionByName(cm_sketch(b, "v"))
                  .groupBy("row", "bucket")
                  .agg(F.sum("cnt").alias("cnt")))
        whole = cm_sketch(df, "v")
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, whole.collect()))

    def test_weighted_counts_equal_raw_stream(self, spark):
        # r13: sketch(pre-aggregated counts, weight_col) must equal
        # sketch(raw stream) EXACTLY — counters are plain sums (the
        # d53 optimization relies on this identity)
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.sketches import (
            cm_sketch)
        df = self._df(spark)
        counts = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        weighted = cm_sketch(counts, "v", depth=3, width=512,
                             weight_col="n")
        raw = cm_sketch(df, "v", depth=3, width=512)
        assert sorted(map(tuple, weighted.collect())) == \
            sorted(map(tuple, raw.collect()))

    def test_missing_probe_estimates_zero_or_collision(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            cm_estimate, cm_sketch)
        df = self._df(spark)
        sk = cm_sketch(df, "v", depth=4, width=4096)
        probes = df.sparkSession.range(900, 903).selectExpr("id as v")
        for r in cm_estimate(sk, probes, "v", depth=4,
                             width=4096).collect():
            assert r.est <= 40  # absent keys bounded by collision mass

    def test_validation(self, spark):
        import pytest
        from datafusion_federation_spark.operators.sketches import (
            cm_sketch)
        with pytest.raises(ValueError, match="depth"):
            cm_sketch(self._df(spark), "v", depth=0)


class TestBloom:
    """Bloom join pruning: the contract is NO FALSE NEGATIVES (so a
    verify join makes pruned results exact) plus layout invariance and
    the empty/NULL edges."""

    M, KH = 1 << 12, 5

    def _sides(self, spark):
        fact = spark.range(5_000).select(F.col("id").alias("k"))
        dim = (spark.range(5_000).filter(F.col("id") % 29 == 0)
               .select(F.col("id").alias("dk")))
        return fact, dim

    def test_no_false_negatives(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            bloom_bits, bloom_prune)
        _, dim = self._sides(spark)
        bits = bloom_bits(dim, "dk", self.M, self.KH)
        kept = bloom_prune(dim.select(F.col("dk").alias("k")), "k",
                           bits, self.M, self.KH)
        assert kept.count() == dim.count()

    def test_semi_join_equals_plain(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            bloom_semi_join)
        fact, dim = self._sides(spark)
        got = sorted(r.k for r in bloom_semi_join(
            fact, dim, "k", "dk", self.M, self.KH).collect())
        want = sorted(r.k for r in fact.join(
            dim, fact["k"] == dim["dk"], "left_semi").collect())
        assert got == want

    def test_pruning_is_effective(self, spark):
        # ~173 of 5000 keys match; with m=4096/kh=5 the filter must cut
        # the candidate set far below the full fact (fill ~ 19%)
        from datafusion_federation_spark.operators.sketches import (
            bloom_bits, bloom_prune)
        fact, dim = self._sides(spark)
        n = bloom_prune(fact, "k",
                        bloom_bits(dim, "dk", self.M, self.KH),
                        self.M, self.KH).count()
        assert dim.count() <= n < 1_000

    def test_layout_invariance(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            bloom_bits)
        _, dim = self._sides(spark)
        one = sorted(bloom_bits(dim.coalesce(1), "dk", self.M,
                                self.KH).collect())
        many = sorted(bloom_bits(dim.repartition(13), "dk", self.M,
                                 self.KH).collect())
        assert one == many

    def test_empty_dim_prunes_everything(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            bloom_bits, bloom_prune)
        fact, dim = self._sides(spark)
        bits = bloom_bits(dim.filter(F.lit(False)), "dk", self.M,
                          self.KH)
        assert bloom_prune(fact, "k", bits, self.M, self.KH).count() == 0

    def test_null_keys_pruned_both_sides(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            bloom_bits, bloom_prune)
        fact = spark.sql("SELECT * FROM VALUES (CAST(NULL AS BIGINT)), "
                         "(29), (30) AS t(k)")
        dim = spark.sql("SELECT * FROM VALUES (CAST(NULL AS BIGINT)), "
                        "(29) AS t(dk)")
        bits = bloom_bits(dim, "dk", self.M, self.KH)
        kept = [r.k for r in bloom_prune(fact, "k", bits, self.M,
                                         self.KH).collect()]
        assert 29 in kept and None not in kept

    def test_contract_checks(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            bloom_bits, bloom_prune)
        fact, dim = self._sides(spark)
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_bits(dim, "dk", m_bits=100)
        with pytest.raises(ValueError, match="hash functions"):
            bloom_bits(dim, "dk", m_bits=128, kh=0)
        with pytest.raises(ValueError, match="reserved"):
            bloom_prune(fact.withColumn("_bp0", F.lit(1)), "k",
                        bloom_bits(dim, "dk", self.M, self.KH),
                        self.M, self.KH)


def test_kmv_null_keys_dropped(spark):
    """NULL keys are not distinct values: the sketch must match the
    sketch of the non-null subset exactly (a NULL hash would otherwise
    land in engine-dependent bottom-k slots — review r6)."""
    from datafusion_federation_spark.operators.sketches import (
        kmv_distinct)
    rows = [("a", 1), ("a", 2), ("a", None), ("b", None), ("b", 3)]
    df = spark.createDataFrame(rows, "g string, k int")
    got = {(r.g, r.n_kept, r.est) for r in
           kmv_distinct(df, "k", ["g"], k=8).collect()}
    clean = {(r.g, r.n_kept, r.est) for r in
             kmv_distinct(df.filter("k IS NOT NULL"), "k", ["g"],
                          k=8).collect()}
    assert got == clean
    assert {g for g, *_ in got} == {"a", "b"}


# ---------------------------------------------------------------------------
# Portable HyperLogLog (r7)
# ---------------------------------------------------------------------------

class TestHLL:
    def test_accuracy_in_raw_regime(self, spark):
        """n=8000 >> 2.5m with p=6 (m=64): raw estimate within 4 sigma
        (sigma ~= 1.04/sqrt(64) = 13%)."""
        from datafusion_federation_spark.operators.sketches import (
            hll_distinct)
        df = spark.range(8000).selectExpr("id", "'g' AS g")
        r = hll_distinct(df, "id", ["g"], p=6).collect()[0]
        assert abs(r.est - 8000) / 8000 < 0.52
        assert r.n_regs == 64          # all registers hit at n >> m

    def test_merge_equals_whole(self, spark):
        """Elementwise register max == sketch of the union, exactly
        (not approximately — the register arrays are identical)."""
        from datafusion_federation_spark.operators.sketches import (
            hll_distinct, hll_estimate, hll_merge, hll_registers)
        df = (spark.range(3000)
              .selectExpr("id", "id % 4 AS shard",
                          "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END g"))
        whole = sorted(map(tuple,
                           hll_distinct(df, "id", ["g"], p=5).collect()))
        parts = hll_registers(df, "id", ["g", "shard"], p=5) \
            .drop("shard")
        merged = hll_estimate(hll_merge(parts, ["g"], p=5), ["g"], p=5)
        assert whole == sorted(map(tuple, merged.collect()))

    def test_layout_invariance(self, spark):
        """Registers are max-aggregates of a pure row function: the
        partition layout cannot change a single output bit."""
        from datafusion_federation_spark.operators.sketches import (
            hll_distinct)
        df = spark.range(2000).selectExpr("id", "'g' AS g")
        a = sorted(map(tuple,
                       hll_distinct(df, "id", ["g"], p=6).collect()))
        b = sorted(map(tuple,
                       hll_distinct(df.repartition(13), "id", ["g"],
                                    p=6).collect()))
        assert a == b

    def test_small_range_correction(self, spark):
        """correct_small=True switches to linear counting below 2.5m —
        near-exact for n << m (every distinct value almost surely hits
        its own register)."""
        from datafusion_federation_spark.operators.sketches import (
            hll_distinct)
        df = spark.range(40).selectExpr("id", "'g' AS g")
        r = hll_distinct(df, "id", ["g"], p=8,
                         correct_small=True).collect()[0]
        assert abs(r.est - 40) < 5

    def test_null_keys_dropped(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            hll_distinct)
        rows = [("a", 1), ("a", 2), ("a", None), ("b", None), ("b", 3)]
        df = spark.createDataFrame(rows, "g string, k int")
        got = sorted(map(tuple, hll_distinct(df, "k", ["g"],
                                             p=6).collect()))
        clean = sorted(map(tuple,
                           hll_distinct(df.filter("k IS NOT NULL"),
                                        "k", ["g"], p=6).collect()))
        assert got == clean
        assert [g for g, *_ in got] == ["a", "b"]

    def test_validation(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            hll_distinct)
        df = spark.range(5).selectExpr("id", "'g' AS g")
        with pytest.raises(ValueError, match="p must be"):
            hll_distinct(df, "id", ["g"], p=3)
        with pytest.raises(ValueError, match="p must be"):
            hll_distinct(df, "id", ["g"], p=13)


# ---------------------------------------------------------------------------
# Histogram quantiles (r7)
# ---------------------------------------------------------------------------

class TestHistQuantiles:
    QS = [("p25", 0.25), ("p50", 0.50), ("p90", 0.90)]

    def test_accuracy_within_bin_width(self, spark):
        """Estimate lands within one bin width of the exact
        percentile for in-range data (uniform 0..1000, binw=10)."""
        from datafusion_federation_spark.operators.sketches import (
            hist_quantile_frame)
        df = spark.range(5000).selectExpr(
            "CAST(pmod(id * 2654435761, 1000) AS DOUBLE) AS v",
            "'g' AS g")
        exact = {lab: df.selectExpr(
            f"percentile(v, CAST({q} AS DOUBLE)) p").collect()[0].p
            for lab, q in self.QS}
        got = hist_quantile_frame(df, "v", ["g"], self.QS,
                                  lo=0.0, hi=1000.0,
                                  n_bins=100).collect()
        assert len(got) == len(self.QS)
        for r in got:
            assert abs(r.est - exact[r.qlabel]) <= 10.0 + 1e-9
            assert r.n == 5000

    def test_merge_equals_whole(self, spark):
        """Shard partials summed down == one-pass counts, and the
        estimates from either state are identical (counts are exact
        integers — merging is lossless by construction)."""
        from datafusion_federation_spark.operators.sketches import (
            hist_counts, hist_merge, hist_quantiles)
        df = (spark.range(4000)
              .selectExpr("CAST(pmod(id * 48271, 640) AS DOUBLE) v",
                          "id % 5 AS shard",
                          "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END g"))
        whole = hist_counts(df, "v", ["g"], 0.0, 640.0, 64)
        parts = hist_counts(df, "v", ["g", "shard"], 0.0, 640.0, 64)
        merged = hist_merge(parts.drop("shard"), ["g"])
        assert sorted(map(tuple, whole.collect())) == \
            sorted(map(tuple, merged.collect()))
        qa = hist_quantiles(whole, ["g"], self.QS, 0.0, 640.0, 64)
        qb = hist_quantiles(merged, ["g"], self.QS, 0.0, 640.0, 64)
        assert sorted(map(tuple, qa.collect())) == \
            sorted(map(tuple, qb.collect()))

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        """Values outside [lo, hi) count in the edge bins: the sketch
        never drops rows, estimates degrade to the range bounds."""
        from datafusion_federation_spark.operators.sketches import (
            hist_counts, hist_quantile_frame)
        rows = [(-50.0,), (5.0,), (15.0,), (250.0,)]
        df = spark.createDataFrame(rows, "v double") \
                  .selectExpr("v", "'g' AS g")
        c = {r.bin: r.cnt for r in
             hist_counts(df, "v", ["g"], 0.0, 100.0, 10).collect()}
        assert c == {0: 2, 1: 1, 9: 1}
        got = hist_quantile_frame(df, "v", ["g"], [("p99", 0.99)],
                                  0.0, 100.0, 10).collect()[0]
        assert got.n == 4 and 90.0 <= got.est <= 100.0

    def test_nulls_dropped_and_layout_invariant(self, spark):
        from datafusion_federation_spark.operators.sketches import (
            hist_quantile_frame)
        rows = [("a", 1.0), ("a", None), ("a", 9.0), ("b", 4.0),
                ("b", None)]
        df = spark.createDataFrame(rows, "g string, v double")
        args = (["g"], [("p50", 0.5)], 0.0, 10.0, 10)
        got = sorted(map(tuple,
                         hist_quantile_frame(df, "v", *args).collect()))
        clean = sorted(map(tuple, hist_quantile_frame(
            df.filter("v IS NOT NULL"), "v", *args).collect()))
        relaid = sorted(map(tuple, hist_quantile_frame(
            df.repartition(7), "v", *args).collect()))
        assert got == clean == relaid
        assert [r[0] for r in got] == ["a", "b"]
        assert [r[2] for r in got] == [2, 1]    # NULLs not in n

    def test_exact_on_bin_centers(self, spark):
        """Pin the estimator arithmetic on a hand-checkable case:
        v in {0,10,..,90} one per bin, p50 -> rank ceil(0.5*10)=5 ->
        bin 4 (cum 5, cum_before 4), frac=(5-4)/1=1 ->
        est = 0 + 10*(4+1) = 50 exactly. A refactor that shifts rank,
        cum bounds, or interpolation breaks this before the oracle."""
        from datafusion_federation_spark.operators.sketches import (
            hist_quantile_frame)
        df = spark.range(10).selectExpr(
            "CAST(id * 10 AS DOUBLE) v", "'g' AS g")
        r = hist_quantile_frame(df, "v", ["g"], [("p50", 0.5)],
                                0.0, 100.0, 10).collect()[0]
        assert r.est == 50.0

    def test_validation(self, spark):
        import pytest
        from datafusion_federation_spark.operators.sketches import (
            hist_counts)
        df = spark.range(3).selectExpr("CAST(id AS DOUBLE) v", "'g' g")
        with pytest.raises(ValueError, match="hi must exceed"):
            hist_counts(df, "v", ["g"], 5.0, 5.0, 8)
        with pytest.raises(ValueError, match="n_bins"):
            hist_counts(df, "v", ["g"], 0.0, 1.0, 1)

    def test_nan_and_infinity_safe_under_ansi(self, spark):
        """ANSI mode raises on non-finite -> int casts: NaN rows drop
        like NULL, +/-inf clamps to the edge bins (double-space clamp
        happens before the cast)."""
        from datafusion_federation_spark.operators.sketches import (
            hist_counts)
        rows = [(1.0,), (float("nan"),), (float("inf"),),
                (float("-inf"),)]
        df = spark.createDataFrame(rows, "v double") \
                  .selectExpr("v", "'g' AS g")
        c = {r.bin: r.cnt for r in
             hist_counts(df, "v", ["g"], 0.0, 100.0, 10).collect()}
        assert c == {0: 2, 9: 1}   # 1.0 and -inf in bin 0; inf in 9

    def test_quantile_fraction_validated(self, spark):
        """q outside (0, 1] must refuse loudly — rank 0 matches no bin
        and the label would silently vanish from the output."""
        import pytest
        from datafusion_federation_spark.operators.sketches import (
            hist_quantile_frame)
        df = spark.range(3).selectExpr("CAST(id AS DOUBLE) v", "'g' g")
        for bad in (0.0, -0.5, 1.5):
            with pytest.raises(ValueError, match="outside"):
                hist_quantile_frame(df, "v", ["g"], [("q", bad)],
                                    0.0, 10.0, 10)

    def test_hist_bin_nan_is_null_not_bin_zero(self, spark):
        """Direct hist_bin callers: NaN maps to NULL, never bin 0
        (least() would otherwise fold NaN into the lowest bin)."""
        from datafusion_federation_spark.operators.sketches import (
            hist_bin)
        import pyspark.sql.functions as F
        rows = [(float("nan"),), (0.5,)]
        df = spark.createDataFrame(rows, "v double")
        got = [r.b for r in
               df.select(hist_bin(F.col("v"), 0.0, 10.0, 10)
                         .alias("b")).collect()]
        assert got == [None, 0]
