"""LLM-pipeline operator tests: pinned deterministic outputs for the
hash-based operators that have no SQL oracle (MinHash/winnowing use
xxhash64, SimHash uses md5-derived word hashes — neither reproducible in
DuckDB SQL), plus planted-near-duplicate unit fixtures proving each
detector actually detects.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_federation_spark.operators import dedup, similarity, text
from tests.conftest import TESTDATA


def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


# ---------------------------------------------------------------------------
# pinned deterministic outputs at sf0.001 (rows-only queries get a real
# expected-value check here, in lieu of a DuckDB oracle)
# ---------------------------------------------------------------------------

def test_minhash_lsh_pinned(spark):
    out = (dedup.minhash_dedup_pairs(docs(spark), "text", "doc_id",
                                     num_hashes=32, bands=8, threshold=0.7)
           .orderBy("id_a", "id_b").collect())
    # 28, up from the 26 found while the two-parameter-lambda trap
    # degraded the signature to one effective hash (dedup.py
    # minhash_signature_from_shingles) — the md5 oracle twin (d24)
    # computes the identical 28 pairs cross-engine
    assert len(out) == 28
    first = [(r["id_a"], r["id_b"], round(r["jaccard"], 6))
             for r in out[:3]]
    assert first == [(0, 50, 0.952381), (0, 82, 0.954545),
                     (5, 450, 0.97561)]
    # symmetric sanity: every pair ordered, no self-pairs
    assert all(r["id_a"] < r["id_b"] for r in out)


def test_minhash_deterministic_across_runs(spark):
    a = (dedup.minhash_dedup_pairs(docs(spark), "text", "doc_id",
                                   num_hashes=32, bands=8, threshold=0.7)
         .orderBy("id_a", "id_b").collect())
    b = (dedup.minhash_dedup_pairs(docs(spark), "text", "doc_id",
                                   num_hashes=32, bands=8, threshold=0.7)
         .orderBy("id_a", "id_b").collect())
    assert a == b


def test_winnow_fingerprint_pinned(spark):
    fp = text.rolling_hash_fingerprint(docs(spark), "text",
                                       id_col="doc_id")
    out = (fp.select("doc_id", F.explode("winnow_fp").alias("h"))
           .groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
           .filter(F.col("n_docs") >= 2)
           .groupBy("n_docs").agg(F.count(F.lit(1)).alias("n_hashes"))
           .orderBy("n_docs").collect())
    assert [(r["n_docs"], r["n_hashes"]) for r in out] == \
        [(2, 260), (3, 9), (4, 14)]


def test_simhash_pinned(spark):
    out = (dedup.simhash_near_pairs(docs(spark), "text", "doc_id",
                                    max_hamming=10)
           .orderBy("id_a", "id_b").collect())
    assert len(out) == 488
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["hamming"]) == (0, 50, 3)
    assert all(0 <= r["hamming"] <= 10 for r in out)


def test_embedding_near_pairs_pinned(spark):
    emb = spark.read.parquet(f"{TESTDATA}/embeddings.parquet")
    out = (similarity.pairwise_cosine_pairs(emb, "embedding", "vec_id",
                                            dim=64, threshold=0.4,
                                            n_planes=8, seed=42)
           .orderBy("id_a", "id_b").collect())
    got = [(r["id_a"], r["id_b"], round(r["cos"], 6)) for r in out]
    assert got == [(390, 483, 0.454308), (397, 471, 0.405846)]


def test_embedding_pairs_hot_bucket_lane(spark):
    # one giant LSH bucket (VERDICT r13 What's-wrong #2): 60 nearly
    # identical embeddings all land in one bucket; with max_bucket=8
    # they must take the exploded self-join lane (bounded per-row
    # state, quadratic rows through a spillable join) and emit the
    # IDENTICAL pair set the in-row expansion lane produces
    import math
    n, dim = 60, 8
    rows = [(i, [1.0] + [0.001 * i * j for j in range(1, dim)])
            for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=dim, threshold=0.99, n_planes=4, seed=7)
    hot = (similarity.pairwise_cosine_pairs(emb, "embedding", "vec_id",
                                            max_bucket=8, **kw)
           .orderBy("id_a", "id_b").collect())
    arr = (similarity.pairwise_cosine_pairs(emb, "embedding", "vec_id",
                                            max_bucket=10 ** 9, **kw)
           .orderBy("id_a", "id_b").collect())
    assert [tuple(r) for r in hot] == [tuple(r) for r in arr]
    assert len(hot) > 100  # the giant bucket really did pair up
    # and the hot lane's plan carries no in-row pair expansion for it:
    # per-row state is one member struct, not an n^2 array
    plan = (similarity.pairwise_cosine_pairs(emb, "embedding", "vec_id",
                                             max_bucket=8, **kw)
            ._jdf.queryExecution().executedPlan().toString())
    assert "posexplode" in plan and "Join" in plan


# ---------------------------------------------------------------------------
# planted near-duplicates: each detector must find a doctored pair
# ---------------------------------------------------------------------------

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill and the birds sing in the "
        "garden under a bright morning sun near the quiet river bank")
NEAR = BASE.replace("morning", "evening")          # one-word edit
FAR = ("completely different content about database systems query "
       "optimization distributed execution shuffle partitioning and "
       "columnar storage formats with vectorized expression evaluation")


@pytest.fixture()
def planted(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR)], "doc_id long, text string")


def test_minhash_finds_planted_pair(planted):
    out = (dedup.minhash_dedup_pairs(planted, "text", "doc_id",
                                     num_hashes=32, bands=8, threshold=0.5)
           .collect())
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_finds_planted_pair(planted):
    out = dedup.simhash_near_pairs(planted, "text", "doc_id",
                                   max_hamming=10).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= 10
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_finds_planted_pair(planted):
    out = dedup.ngram_jaccard_pairs(planted, "text", "doc_id",
                                    n=3, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in pairs


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(10, "same text"), (4, "same text"), (7, "other")],
        "doc_id long, text string")
    kept = sorted(r["doc_id"]
                  for r in dedup.exact_dedup(df, ["text"], "doc_id").collect())
    assert kept == [4, 7]


def test_cosine_topk_exact_match_first(spark):
    rows = [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0]),
            (3, [0.9, 0.1, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_topk(df, "embedding", [1.0, 0.0, 0.0], k=2,
                                 id_col="vec_id").collect()
    assert out[0]["vec_id"] == 1 and out[0]["score"] == 1.0
    assert out[1]["vec_id"] == 3


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_meta_and_features(spark):
    from datafusion_federation_spark.operators import multimodal as mm
    df = mm.attach_binary_payload(docs(spark).limit(50), "text")
    meta = mm.extract_media_meta(df, "payload", "doc_id")
    rows = meta.collect()
    assert len(rows) == 50
    assert all(r["n_bytes"] > 0 and 1 <= r["width"] <= 640 for r in rows)

    emb = mm.feature_extract_stub(df, "payload", "doc_id", dim=16)
    out = emb.collect()
    assert len(out) == 50 and all(len(r["embedding"]) == 16 for r in out)
    # deterministic: same payload -> same vector
    out2 = mm.feature_extract_stub(df, "payload", "doc_id", dim=16).collect()
    assert sorted(map(tuple, ((r["doc_id"], tuple(r["embedding"]))
                              for r in out))) == \
        sorted(map(tuple, ((r["doc_id"], tuple(r["embedding"]))
                           for r in out2)))


def test_multimodal_frame_sampling(spark):
    from datafusion_federation_spark.operators import multimodal as mm
    df = mm.attach_binary_payload(docs(spark).limit(10), "text")
    frames = mm.frame_sample_stub(df, "payload", every_ms=500)
    rows = frames.collect()
    assert len(rows) >= 10
    assert "payload" not in frames.columns   # payload never shuffles
    assert all(r["frame_ts_ms"] == r["frame_idx"] * 500 for r in rows)


def test_multimodal_real_decode_raises(spark):
    from datafusion_federation_spark.operators import multimodal as mm
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="ffmpeg-class"):
        mm.real_decode(b"xx")


# ---------------------------------------------------------------------------
# skew mitigation (exactness of the salted rewrites)
# ---------------------------------------------------------------------------

def test_salted_aggregate_equals_plain(spark):
    from datafusion_federation_spark.operators.skew import salted_aggregate
    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
    got = salted_aggregate(
        li, ["l_returnflag"],
        {"qty": ("sum", "l_quantity"), "n": ("count", "l_orderkey"),
         "mx": ("max", "l_extendedprice"), "avg_q": ("avg", "l_quantity")},
        n_salt=8)
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.count("l_orderkey").alias("n"),
        F.max("l_extendedprice").alias("mx"),
        (F.sum("l_quantity") / F.count("l_quantity")).alias("avg_q"))
    g = {r["l_returnflag"]: (r["qty"], r["n"], r["mx"], round(r["avg_q"], 9))
         for r in got.collect()}
    w = {r["l_returnflag"]: (r["qty"], r["n"], r["mx"], round(r["avg_q"], 9))
         for r in want.collect()}
    assert g == w


def test_salted_aggregate_rejects_nonalgebraic(spark):
    from datafusion_federation_spark.operators.skew import salted_aggregate
    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
    with pytest.raises(ValueError, match="algebraic"):
        salted_aggregate(li, ["l_returnflag"],
                         {"m": ("median", "l_quantity")})


def test_salted_join_equals_plain(spark):
    from datafusion_federation_spark.operators.skew import salted_join
    li = spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
    o = (spark.read.parquet(f"{TESTDATA}/orders.parquet")
         .select(F.col("o_orderkey").alias("l_orderkey"),
                 "o_orderpriority"))
    got = (salted_join(li, o, "l_orderkey", n_salt=4)
           .groupBy("o_orderpriority").count())
    want = (li.join(o, "l_orderkey")
            .groupBy("o_orderpriority").count())
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_ivf_topk_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{TESTDATA}/embeddings.parquet")
    query = [((i * 37) % 19 - 9) / 9.0 for i in range(64)]
    exact = [r["vec_id"] for r in similarity.cosine_topk(
        emb, "embedding", query, k=10, id_col="vec_id").collect()]
    approx = [r["vec_id"] for r in similarity.ivf_topk(
        emb, "embedding", query, k=10, id_col="vec_id",
        n_clusters=8, n_probe=4).collect()]
    # probing half the cells must recover at least half the true top-10,
    # and every returned id must be a real row
    assert len(set(exact) & set(approx)) >= 5
    assert len(approx) == 10


def test_lsh_bands_divisibility_is_value_error(spark):
    # contract check must be a real exception (an assert is stripped
    # under python -O)
    from datafusion_federation_spark.operators import dedup
    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    with pytest.raises(ValueError, match="divisible"):
        dedup.minhash_dedup_pairs(docs, "text", "doc_id",
                                  num_hashes=10, bands=4)


def test_ivf_fixed_full_probe_equals_brute_force(spark):
    # the deterministic-centroid twin (d27): probing ALL cells must be
    # exactly brute force — assignment only partitions, never drops
    emb = spark.read.parquet(f"{TESTDATA}/embeddings.parquet")
    query = [((i * 11) % 13 - 6) / 6.0 for i in range(64)]
    exact = similarity.cosine_topk(
        emb, "embedding", query, k=10, id_col="vec_id").collect()
    full = similarity.ivf_fixed_topk(
        emb, "embedding", query, k=10, id_col="vec_id",
        n_clusters=8, n_probe=8).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in full]


def test_ivf_fixed_recall_and_validity(spark):
    emb = spark.read.parquet(f"{TESTDATA}/embeddings.parquet")
    query = [((i * 37) % 19 - 9) / 9.0 for i in range(64)]
    exact = [r["vec_id"] for r in similarity.cosine_topk(
        emb, "embedding", query, k=10, id_col="vec_id").collect()]
    approx = [r["vec_id"] for r in similarity.ivf_fixed_topk(
        emb, "embedding", query, k=10, id_col="vec_id",
        n_clusters=8, n_probe=4).collect()]
    assert len(approx) == 10
    assert len(set(exact) & set(approx)) >= 5


def test_ivf_full_probe_equals_brute_force(spark):
    emb = spark.read.parquet(f"{TESTDATA}/embeddings.parquet")
    query = [((i * 11) % 13 - 6) / 6.0 for i in range(64)]
    exact = similarity.cosine_topk(
        emb, "embedding", query, k=10, id_col="vec_id").collect()
    full = similarity.ivf_topk(
        emb, "embedding", query, k=10, id_col="vec_id",
        n_clusters=8, n_probe=8).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in full]


# ---------------------------------------------------------------------------
# bucketing: co-located joins and partition-pruned LSH probes
# ---------------------------------------------------------------------------

def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from datafusion_federation_spark.operators import bucketing
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    li = (spark.read.parquet(f"{TESTDATA}/lineitem.parquet")
          .select("l_orderkey", "l_quantity"))
    o = (spark.read.parquet(f"{TESTDATA}/orders.parquet")
         .select(F.col("o_orderkey").alias("l_orderkey"),
                 "o_orderpriority"))
    bucketing.write_bucketed(li, "li_b", "l_orderkey", n_buckets=8,
                             sort_col="l_orderkey")
    bucketing.write_bucketed(o, "o_b", "l_orderkey", n_buckets=8,
                             sort_col="l_orderkey")
    # force the shuffle-join path (at fixture size Spark would broadcast,
    # which hides bucketing; at 100 TB neither side broadcasts)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketing.colocated_join(spark, "li_b", "o_b", "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, \
            "identically-bucketed join must not shuffle"
        assert "Bucketed: true" in plan
        want = li.join(o, "l_orderkey").count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_lsh_partitioned_probe_prunes(spark, tmp_path):
    from datafusion_federation_spark.operators import bucketing, similarity
    emb = spark.read.parquet(f"{TESTDATA}/embeddings.parquet")
    planes = similarity.random_hyperplanes(64, 8, seed=42)
    bucketed = emb.withColumn(
        "bucket", similarity.lsh_signature(F.col("embedding"), planes))
    path = str(tmp_path / "emb_lsh")
    bucketing.write_lsh_partitioned(bucketed, path, "bucket")
    probed = bucketing.read_probed(spark, path, "bucket", [3, 7, 11])
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    got = sorted(r["vec_id"] for r in probed.select("vec_id").collect())
    want = sorted(r["vec_id"] for r in bucketed
                  .filter(F.col("bucket").isin([3, 7, 11]))
                  .select("vec_id").collect())
    assert got == want


def test_training_corpus_pipeline(spark):
    from datafusion_federation_spark.operators.pipeline import (
        CorpusPrepConfig, corpus_report, prepare_training_corpus)
    raw = docs(spark)
    out = prepare_training_corpus(
        raw, CorpusPrepConfig(min_quality=0.3, near_dup_threshold=0.85))
    n_in, n_out = raw.count(), out.count()
    assert 0 < n_out < n_in                 # something survived AND dropped
    cols = set(out.columns)
    assert {"quality", "lang_pred", "n_tokens"} <= cols
    # survivors pass the quality gate, are exact-unique, and have no
    # near-duplicate pair remaining above the threshold
    assert out.filter(F.col("quality") < 0.3).count() == 0
    assert out.select("text").distinct().count() == n_out
    from datafusion_federation_spark.operators import dedup
    left = dedup.minhash_dedup_pairs(out, "text", "doc_id",
                                     threshold=0.85).count()
    assert left == 0
    rep = corpus_report(raw, out).collect()[0]
    assert rep["n_input"] == n_in and rep["n_output"] == n_out


def test_two_phase_sessionization_equals_single_window(spark):
    from datafusion_federation_spark.operators.skew import (
        two_phase_sessionization)
    from datafusion_federation_spark.queries import REGISTRY, t
    events = t(spark, TESTDATA, "events")
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in two_phase_sessionization(events, chunk="6 hours")
           .collect()}
    q42 = REGISTRY["q42_sessionization"][0]
    want = {r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in q42(spark, TESTDATA).collect()}
    assert got == want


def test_two_phase_sessionization_tiny_chunks_still_exact(spark):
    # pathological salt: chunks smaller than the gap force many boundary
    # merges; result must still be exact
    from datafusion_federation_spark.operators.skew import (
        two_phase_sessionization)
    from datafusion_federation_spark.queries import REGISTRY, t
    events = t(spark, TESTDATA, "events")
    got = {r["user_id"]: (r["n_sessions"], r["n_events"])
           for r in two_phase_sessionization(events, chunk="10 minutes")
           .collect()}
    q42 = REGISTRY["q42_sessionization"][0]
    want = {r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in q42(spark, TESTDATA).collect()}
    assert got == want


def test_exact_dedup_null_safe(spark):
    # ('x', NULL) and (NULL, 'x') are DIFFERENT rows — a concat_ws digest
    # would collide them (concat_ws drops nulls)
    df = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, "x", None)],
        "id long, a string, b string")
    kept = sorted(r["id"] for r in
                  dedup.exact_dedup(df, ["a", "b"], "id").collect())
    assert kept == [1, 2]


def test_minhash_null_text_no_spurious_candidates(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None), (4, "real text here with words"),
         (5, "")],
        "doc_id long, text string")
    cand = dedup.minhash_lsh_candidates(df, "text", "doc_id").collect()
    assert cand == []      # null/empty docs pair with nothing


def test_sessionize_dispatch_hot_user_threshold(spark):
    """q42's front door: default threshold keeps the simple single-window
    plan; a forced tiny threshold flips to the two-phase chunk-salted
    plan (visible as the __chunk salt column) with identical results."""
    import contextlib
    import io

    from datafusion_federation_spark.queries import REGISTRY, t as load

    q42 = REGISTRY["q42_sessionization"][0]
    base = {tuple(r) for r in q42(spark, TESTDATA).collect()}

    old = spark.conf.get("spark.graft.sessionization.hotUserThreshold",
                         None)
    spark.conf.set("spark.graft.sessionization.hotUserThreshold", "1")
    try:
        df = q42(spark, TESTDATA)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(True)
        assert "__chunk" in buf.getvalue(), \
            "hot-user threshold must engage the two-phase salted plan"
        assert {tuple(r) for r in df.collect()} == base
    finally:
        if old is None:
            spark.conf.unset("spark.graft.sessionization.hotUserThreshold")
        else:
            spark.conf.set(
                "spark.graft.sessionization.hotUserThreshold", old)


def test_pii_stats_and_redact(spark):
    from datafusion_federation_spark.operators import text as T

    rows = [(1, "mail a.b+c@ex-ample.org or x@y.io, call 555-0199, "
                "see https://ex.org/a?b=1 now"),
            (2, "clean text, no pii; 555-12 is not a phone"),
            (3, "edge: a@b.co at end https://z.dev")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["n_emails"], r["n_phones"], r["n_urls"])
           for r in T.pii_stats(df, "text").collect()}
    assert got == {1: (2, 1, 1), 2: (0, 0, 0), 3: (1, 0, 1)}

    red = {r["id"]: r["red"] for r in df.select(
        "id", T.pii_redact(df.text).alias("red")).collect()}
    assert red[1] == ("mail <EMAIL> or <EMAIL>, call <PHONE>, "
                      "see <URL> now")
    assert red[2] == "clean text, no pii; 555-12 is not a phone"
    assert red[3] == "edge: <EMAIL> at end <URL>"


def test_connected_components_chain_and_cliques(spark):
    """Min-label propagation must handle a CHAIN (diameter > 1, needs
    multiple rounds), a separate clique, and leave labels = component
    minimum."""
    from datafusion_federation_spark.operators.dedup import (
        connected_components)

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain 1-2-3-4-5
         (10, 11), (11, 12), (10, 12),           # triangle 10-11-12
         (20, 21)],                              # pair
        "id_a long, id_b long")
    got = {(r["v"], r["label"])
           for r in connected_components(edges).collect()}
    want = {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
            (10, 10), (11, 10), (12, 10),
            (20, 20), (21, 20)}
    assert got == want


def test_ngram_jaccard_max_doc_freq_cap(spark):
    """The opt-in doc-frequency cap drops stop-phrase shingles (logged,
    lower-bound semantics) while the default stays exact."""
    from datafusion_federation_spark.operators.dedup import (
        ngram_jaccard_pairs)

    boiler = "the quick brown fox jumps over the lazy dog"
    rows = ([(i, f"{boiler} unique{i} filler{i} pad{i}")
             for i in range(8)]                # share ONLY boilerplate
            + [(100, "alpha beta gamma delta epsilon zeta"),
               (101, "alpha beta gamma delta epsilon zeta")])  # true dups
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5)
    capped = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5,
                                 max_doc_freq=4)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the true duplicate pair survives the cap (its shingles are rare)
    assert (100, 101) in capped_pairs
    # capped results are a subset of exact (lower bound, never invents)
    assert capped_pairs <= exact_pairs
    # and the boilerplate-only pairs are what gets dropped
    assert all(a >= 100 for a, _ in capped_pairs)


def test_prepare_and_split_funnel_and_assignment(spark):
    """End-to-end corpus flow with splits: survivors are a subset of
    the prepared corpus, every survivor gets exactly one split, and
    assignments are stable across input partitionings."""
    from datafusion_federation_spark.operators.pipeline import (
        CorpusPrepConfig, prepare_and_split, prepare_training_corpus)
    from tests.conftest import TESTDATA
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    cfg = CorpusPrepConfig(min_quality=0.3)
    out = prepare_and_split(docs, cfg, sample_frac=0.5)
    base = prepare_training_corpus(docs, cfg)
    n_out, n_base = out.count(), base.count()
    assert 0 < n_out < n_base          # sampling really reduced input
    assert out.filter(F.col("split").isNull()).count() == 0
    assert set(r[0] for r in out.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    out2 = prepare_and_split(docs.repartition(7), cfg, sample_frac=0.5)
    a = {(r["doc_id"], r["split"]) for r in
         out.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in
         out2.select("doc_id", "split").collect()}
    assert a == b


def test_near_dup_ops_drop_blank_docs(spark):
    """k blank/whitespace docs must NOT emit k*(k-1)/2 spurious pairs
    from any near-dup path (they share every LSH bucket / hash to
    signature 0)."""
    from pyspark.sql import Row
    base = [Row(doc_id=i, text=t) for i, t in enumerate(
        ["alpha beta gamma delta epsilon zeta", "", "   ", None,
         "alpha beta gamma delta epsilon zet"])]
    df = spark.createDataFrame(base)
    mh = dedup.minhash_dedup_pairs(df, "text", "doc_id",
                                   num_hashes=8, bands=2, threshold=0.5)
    assert all({r["id_a"], r["id_b"]} <= {0, 4} for r in mh.collect())
    sp = dedup.simhash_near_pairs(df, "text", "doc_id", max_hamming=10)
    assert all({r["id_a"], r["id_b"]} <= {0, 4} for r in sp.collect())
    md = dedup.minhash_md5_candidates(df, "text", "doc_id",
                                      num_hashes=8, bands=2)
    assert all({r["id_a"], r["id_b"]} <= {0, 4} for r in md.collect())


def test_incremental_dedup_stages(spark):
    """Each stage drops what it should: within-batch exact dup (keep
    min id), exact corpus dup, near-dup vs corpus; distinct docs
    survive with original columns."""
    from datafusion_federation_spark.operators import dedup as dd
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over dogs"),
         (2, "completely different corpus text here")],
        ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(10, "THE  quick   brown fox jumps over dogs"),  # exact (norm) vs corpus
         (11, "fresh novel content alpha beta gamma delta"),
         (12, "fresh novel content alpha beta gamma delta"),  # exact within batch
         (13, "the quick brown fox jumps over cats"),     # near-dup of 1
         (14, "entirely unrelated writing about spark")],
        ["doc_id", "text"])
    out = dd.incremental_dedup(batch, corpus, "text", "doc_id",
                               n=3, threshold=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == [11, 14]
    assert out.columns == ["doc_id", "text"]


def test_token_rarity_exact_values(spark):
    """score = sum(corpus_count)/(n_tokens*total) on a corpus with
    hand-computed counts (a=3, b=1, c=1, total=5)."""
    from datafusion_federation_spark.operators import text as tx
    df = spark.createDataFrame([(1, "a a b"), (2, "a c")],
                               ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tokens"], r["rarity_score"])
           for r in tx.token_rarity_scores(df, "text",
                                           "doc_id").collect()}
    assert got[1] == (3, 7 / 5 / 3)
    assert got[2] == (2, 4 / 5 / 2)


def test_jaccard_prefix_filter_exact_and_prunes(spark):
    """PPJoin-style prefix filtering: identical pairs to the plain path
    on the fixture AND on a boilerplate-heavy corpus where the plain
    shingle buckets explode (measured 448k naive bucket pairs -> 1
    prefix candidate on 300 docs sharing one hot phrase)."""
    from pyspark.sql import functions as F

    from datafusion_federation_spark.operators import dedup as dd
    docs = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    for t in (0.5, 0.8):
        a = sorted(map(tuple, dd.ngram_jaccard_pairs(
            docs, "text", "doc_id", 3, t).collect()))
        b = sorted(map(tuple, dd.ngram_jaccard_pairs_prefix(
            docs, "text", "doc_id", 3, t).collect()))
        assert a == b
    rows = [(i, "the quick brown fox jumps over the lazy dog and dog "
             + f"u{i} v{i} w{i} x{i}") for i in range(120)]
    rows += [(1000, "alpha beta gamma delta epsilon zeta eta theta "
                    "iota kappa"),
             (1001, "alpha beta gamma delta epsilon zeta eta theta "
                    "iota lambda")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    base = sorted(map(tuple, dd.ngram_jaccard_pairs(
        df, "text", "doc_id", 3, 0.7).collect()))
    pref = sorted(map(tuple, dd.ngram_jaccard_pairs_prefix(
        df, "text", "doc_id", 3, 0.7).collect()))
    assert pref == base and len(base) == 1          # the 1000/1001 pair
    n_cand = dd.jaccard_prefix_candidates(
        df, "text", "doc_id", 3, 0.7).count()
    sh = dd.shingle_table(df, "text", "doc_id", 3)
    naive = (sh.groupBy("shingle")
             .agg(F.count("*").alias("k")).filter("k >= 2")
             .select((F.col("k") * (F.col("k") - 1) / 2).alias("p"))
             .agg(F.sum("p")).collect()[0][0])
    assert n_cand < naive / 100     # hot-phrase buckets excluded


class TestZOrder:
    def _ref_key(self, vals, bounds, bits=16):
        ncols, top = len(vals), (1 << bits) - 1
        qs = []
        for v, (mn, mx) in zip(vals, bounds):
            import math
            x = (float(v) - mn) / (mx - mn) * top
            qs.append(min(max(int(math.floor(x)), 0), top))
        key = 0
        for i in range(bits):
            for ci, q in enumerate(qs):
                key += ((q >> i) & 1) << (i * ncols + ci)
        return key

    def test_key_matches_pure_python(self, spark):
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.bucketing import (
            zorder_key)
        rows = [(0.0, 0.0), (1.0, 1.0), (0.5, 0.25), (2.0, -1.0),
                (0.123, 0.987)]
        df = spark.createDataFrame(rows, "x double, y double")
        bounds = [(0.0, 1.0), (0.0, 1.0)]
        got = [r.k for r in df.select(zorder_key(
            [F.col("x"), F.col("y")], bounds).alias("k")).collect()]
        want = [self._ref_key(v, bounds) for v in rows]
        assert got == want

    def test_cluster_tiles_are_compact(self, spark):
        # after z-clustering, the average per-partition bounding-box
        # area must beat the unclustered layout by a wide margin —
        # the property that makes min/max file stats prune
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.bucketing import (
            zorder_cluster)
        df = spark.range(4096).select(
            ((F.col("id") * 2654435761) % 1000).cast("double")
            .alias("x"),
            ((F.col("id") * 40503) % 1000).cast("double").alias("y"))
        bounds = [(0.0, 1000.0), (0.0, 1000.0)]

        def mean_box_area(frame):
            stats = (frame.groupBy(F.spark_partition_id().alias("p"))
                     .agg(((F.max("x") - F.min("x"))
                           * (F.max("y") - F.min("y"))).alias("a"))
                     .agg(F.avg("a")).collect()[0][0])
            return stats

        clustered = zorder_cluster(df, ["x", "y"], bounds,
                                   num_partitions=16)
        rand = df.repartition(16)
        assert mean_box_area(clustered) < mean_box_area(rand) / 4

    def test_zorder_validation(self, spark):
        import pytest
        from pyspark.sql import functions as F
        from datafusion_federation_spark.operators.bucketing import (
            zorder_cluster, zorder_key)
        with pytest.raises(ValueError, match="bound"):
            zorder_key([F.col("x")], [])
        with pytest.raises(ValueError, match="64-bit"):
            zorder_key([F.col("x")] * 4, [(0, 1)] * 4, bits=16)
        with pytest.raises(ValueError, match="degenerate"):
            zorder_key([F.col("x")], [(1.0, 1.0)])
        df = spark.range(3).select(F.col("id").cast("double").alias("x"),
                                   F.lit(1).alias("_zkey"))
        with pytest.raises(ValueError, match="_zkey"):
            zorder_cluster(df, ["x"], [(0.0, 3.0)], 2)


class TestCollocations:
    def test_lift_hand_case(self, spark):
        from datafusion_federation_spark.operators.text import (
            collocations)
        # "big data" appears 3x; tokens: big=3, data=3, N=9
        docs = spark.createDataFrame(
            [(1, "big data big data x"), (2, "big data y z")],
            "doc_id int, text string")
        rows = collocations(docs, "text", "doc_id",
                            min_count=3, top_n=5).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.w1, r.w2, r.c_ab) == ("big", "data", 3)
        assert r.lift == round(3 * 9 / (3 * 3), 6)

    def test_no_cross_document_bigrams(self, spark):
        from datafusion_federation_spark.operators.text import (
            collocations)
        # "b a" would only exist across the doc boundary
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b")], "doc_id int, text string")
        rows = collocations(docs, "text", "doc_id",
                            min_count=1, top_n=10).collect()
        assert {(r.w1, r.w2) for r in rows} == {("a", "b")}

    def test_min_count_validation(self, spark):
        import pytest
        from datafusion_federation_spark.operators.text import (
            collocations)
        docs = spark.createDataFrame([(1, "a b")],
                                     "doc_id int, text string")
        with pytest.raises(ValueError, match="min_count"):
            collocations(docs, "text", "doc_id", min_count=0)


class TestEdit1Pairs:
    VOCAB = ["cat", "bat", "cart", "cat", "dog", "dot", "dots",
             "xylophone", "at", "a", "zcat"]

    def test_matches_brute_force(self, spark):
        from datafusion_federation_spark.operators.text import (
            edit1_pairs)

        def lev(a, b):
            if len(a) < len(b):
                a, b = b, a
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        vocab = sorted(set(self.VOCAB))
        want = {(a, b) for i, a in enumerate(vocab)
                for b in vocab[i + 1:] if lev(a, b) == 1}
        df = spark.createDataFrame([(w,) for w in self.VOCAB],
                                   "w string")
        got = {(r.w1, r.w2) for r in edit1_pairs(df).collect()}
        # the brute set must contain a first-char substitution
        # (cat/bat) and an insertion (cat/zcat is NOT distance 1 —
        # but dot/dots and at/cat-like shapes are); sanity that the
        # test is non-vacuous across categories:
        assert ("bat", "cat") in want          # first-char subst
        assert ("dot", "dots") in want         # suffix insert
        assert got == want

    def test_no_quadratic_candidate_stage(self, spark):
        from datafusion_federation_spark.operators.text import (
            edit1_pairs)
        df = spark.createDataFrame([(w,) for w in self.VOCAB],
                                   "w string")
        plan = edit1_pairs(df)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestInvertedIndex:
    DOCS = [(1, "b a a c"), (2, "a b"), (3, "c"), (4, ""),
            (5, None), (6, "A b")]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    def test_matches_brute_force(self, spark):
        got = {r.term: (r.df_docs, r.postings) for r in
               text.inverted_index(self._df(spark), "text", "doc_id")
               .collect()}
        # lowercased, per-doc deduped, empty/None dropped, sorted ids
        assert got == {"a": (3, [1, 2, 6]),
                       "b": (3, [1, 2, 6]),
                       "c": (2, [1, 3])}

    def test_cap_keeps_lowest_ids_and_exact_df(self, spark):
        got = {r.term: (r.df_docs, r.postings) for r in
               text.inverted_index(self._df(spark), "text", "doc_id",
                                   max_postings=2).collect()}
        assert got["a"] == (3, [1, 2])     # df exact, postings capped
        assert got["c"] == (2, [1, 3])     # under the cap: untouched

    def test_two_phase_topk_plan(self, spark):
        # capped path: partial aggregation (map-side combine) BEFORE the
        # first Exchange, no Window operator anywhere — the old
        # count().over(term) + row_number() form sorted a stop term's
        # full posting set in one task (VERDICT r5 item 2)
        plan = (text.inverted_index(self._df(spark), "text", "doc_id",
                                    max_postings=8)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Window" not in plan, plan
        first_ex = plan.find("Exchange")
        assert first_ex != -1, plan
        # the (pid, term) partial aggregate sits BELOW (i.e. printed
        # after) the first Exchange in the tree dump
        assert "partial_count" in plan[first_ex:], plan
        assert "partial_collect_list" in plan[first_ex:], plan

    def test_uncapped_single_exchange(self, spark):
        plan = (text.inverted_index(self._df(spark), "text", "doc_id")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1, plan
        assert "Window" not in plan, plan

    def test_contract_errors(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="max_postings"):
            text.inverted_index(df, "text", "doc_id", max_postings=0)
        bad = df.withColumnRenamed("text", "term")
        with pytest.raises(ValueError, match="collide"):
            text.inverted_index(bad, "term", "doc_id")

    def test_partition_layout_invariant(self, spark):
        df = self._df(spark)
        a = sorted(map(tuple, text.inverted_index(
            df.coalesce(1), "text", "doc_id", max_postings=2).collect()))
        b = sorted(map(tuple, text.inverted_index(
            df.repartition(7, "doc_id"), "text", "doc_id",
            max_postings=2).collect()))
        assert a == b


class TestBM25:
    DOCS = [(1, "join hash join"), (2, "hash"), (3, "sort merge"),
            (4, ""), (5, None)]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, text string")

    @staticmethod
    def _ref(docs, terms, k1=1.2, b=0.75, form="ratio"):
        import math
        toks = {i: [w for w in (t or "").lower().split(" ") if w]
                for i, t in docs}
        n = len(docs)
        # avglen skips NULL-text docs on BOTH engines (split(NULL) is
        # NULL, AVG ignores NULL); empty strings count as length 0
        lens = [len(toks[i]) for i, t in docs if t is not None]
        avg = sum(lens) / len(lens)
        out = {}
        for i, ws in toks.items():
            s = 0.0
            for t in set(ws) & set(terms):
                tf = float(ws.count(t))
                dfc = float(sum(1 for v in toks.values() if t in v))
                ratio = (n - dfc + 0.5) / (dfc + 0.5)
                idf = math.log(ratio + 1.0) if form == "log" else ratio
                s += idf * tf * (k1 + 1.0) / (
                    tf + k1 * (1 - b + b * len(ws) / avg))
            if s:
                out[i] = round(s, 6)
        return out

    def test_matches_hand_reference_both_idf_forms(self, spark):
        from datafusion_federation_spark.operators.text import bm25_scores
        for form in ("ratio", "log"):
            got = {r.doc_id: r.score for r in bm25_scores(
                self._df(spark), "text", "doc_id", ["join", "hash"],
                idf_form=form).collect()}
            want = self._ref(self.DOCS, ["join", "hash"], form=form)
            assert set(got) == set(want)
            for k in want:
                assert got[k] == pytest.approx(want[k], abs=1e-6), form

    def test_topk_ordering_and_validation(self, spark):
        from datafusion_federation_spark.operators.text import bm25_scores
        top = bm25_scores(self._df(spark), "text", "doc_id",
                          ["join", "hash"], topk=1).collect()
        assert len(top) == 1 and top[0].doc_id == 1  # tf=2 wins
        with pytest.raises(ValueError, match="query_terms"):
            bm25_scores(self._df(spark), "text", "doc_id", [])
        with pytest.raises(ValueError, match="idf_form"):
            bm25_scores(self._df(spark), "text", "doc_id", ["a"],
                        idf_form="bad")
        with pytest.raises(ValueError, match="topk"):
            bm25_scores(self._df(spark), "text", "doc_id", ["a"],
                        topk=0)

    def test_term_filter_before_shuffle(self, spark):
        """The isin() prune must sit below the first Exchange — that is
        the corpus-vs-sliver distinction at 100 TB."""
        from datafusion_federation_spark.operators.text import bm25_scores
        plan = bm25_scores(self._df(spark), "text", "doc_id",
                           ["join"])._jdf.queryExecution() \
            .executedPlan().toString()
        first_ex = plan.find("Exchange")
        assert first_ex != -1
        assert "__bm_t" in plan[first_ex:] and "IN (join)" in plan or \
               "__bm_t" in plan[first_ex:]


# ---------------------------------------------------------------------------
# inverted index: two-phase top-K vs Python brute force (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _ii_corpora(draw):
    n_docs = draw(st.integers(1, 25))
    vocab = ["a", "b", "c", "dd", "ee", "stop"]
    docs_ = []
    for i in range(n_docs):
        words = draw(st.lists(st.sampled_from(vocab), max_size=12))
        # 'stop' is hot: half the docs get it appended, making one term
        # span many partitions — the two-phase merge's interesting case
        if i % 2 == 0:
            words.append("stop")
        docs_.append((i, " ".join(words)))
    k = draw(st.integers(1, 5))
    parts = draw(st.integers(1, 7))
    return docs_, k, parts


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(case=_ii_corpora())
def test_inverted_index_two_phase_matches_brute(spark, case):
    docs_, k, parts = case
    df = spark.createDataFrame(docs_, "doc_id long, text string") \
        .repartition(parts)
    got = {r.term: (r.df_docs, list(r.postings)) for r in
           text.inverted_index(df, "text", "doc_id",
                               max_postings=k).collect()}
    want = {}
    for i, t_ in docs_:
        for w in set(x for x in t_.lower().split(" ") if x):
            want.setdefault(w, []).append(i)
    want = {w: (len(ids), sorted(ids)[:k]) for w, ids in want.items()}
    assert got == want


def test_minhash_signature_wrapper_matches_from_shingles(spark):
    """The convenience wrapper (inline shingle build) must produce the
    identical signature as the hot-path from-shingles form."""
    df = spark.createDataFrame([(1, BASE), (2, NEAR)],
                               "doc_id long, text string")
    a = df.select("doc_id", dedup.minhash_signature(
        F.col("text"), num_hashes=8).alias("sig"))
    b = df.select("doc_id", dedup.minhash_signature_from_shingles(
        dedup.word_shingles(F.col("text"), 3), num_hashes=8)
        .alias("sig"))
    got_a = {r.doc_id: list(r.sig) for r in a.collect()}
    got_b = {r.doc_id: list(r.sig) for r in b.collect()}
    assert got_a == got_b
    assert all(len(v) == 8 for v in got_a.values())
    # near-duplicate docs must agree on most signature slots
    same = sum(x == y for x, y in zip(got_a[1], got_a[2]))
    assert same >= 5


def test_multimodal_resize_stub_plumbing(spark):
    from datafusion_federation_spark.operators import multimodal as mm
    df = mm.attach_binary_payload(docs(spark).limit(7), "text")
    out = mm.resize_stub(df, "payload", width=224, height=128)
    rows = out.collect()
    assert len(rows) == 7
    assert all(r.target_w == 224 and r.target_h == 128 for r in rows)
    # payload rides through the Arrow batch untouched
    assert all(r.payload is not None and len(r.payload) > 0
               for r in rows)


@st.composite
def _weird_corpora(draw):
    # adversarial tokenizer inputs: multi-space runs, tabs/newlines
    # (NOT split — the tokenizer splits on literal ' '), punctuation,
    # unicode, empty and None docs
    alphabet = ["a", "bb", "c.d", "é", "漢", "x,y", "", " ", "\t", "\n"]
    n = draw(st.integers(1, 12))
    rows = []
    for i in range(n):
        if draw(st.booleans()):
            words = draw(st.lists(st.sampled_from(alphabet), max_size=8))
            rows.append((i, " ".join(words)))
        else:
            rows.append((i, draw(st.sampled_from([None, "", "  "]))))
    return rows


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=_weird_corpora())
def test_inverted_index_tokenizer_matches_duckdb(spark, rows):
    """Cross-ENGINE fuzz of the shared split-on-space tokenizer:
    Spark's split(lower(x), ' ') and DuckDB's string_split(lower(x),
    ' ') must agree on multi-space runs, tabs/newlines (kept inside
    tokens), punctuation, and unicode — the tokenizer is load-bearing
    for d64/d69/d09 and a semantic drift here would silently skew
    every text oracle."""
    import duckdb
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.term, r.df_docs, tuple(r.postings)) for r in
           text.inverted_index(df, "text", "doc_id",
                               max_postings=4).collect()}
    con = duckdb.connect()
    con.register("docs_py", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]))
    want = {(t, n, tuple(p)) for t, n, p in con.execute("""
        WITH pairs AS (
          SELECT doc_id,
                 unnest(list_distinct(list_filter(
                   string_split(lower(text), ' '), w -> w <> ''))) AS term
          FROM docs_py),
        x AS (SELECT term, doc_id,
                     COUNT(*) OVER (PARTITION BY term) AS dfd,
                     ROW_NUMBER() OVER (PARTITION BY term
                                        ORDER BY doc_id) AS rn
              FROM pairs)
        SELECT term, CAST(dfd AS BIGINT), list_sort(list(doc_id))
        FROM x WHERE rn <= 4 GROUP BY term, dfd""").fetchall()}
    con.close()
    assert got == want


def test_fan_out_shuffled_frame_still_repartitions(spark):
    """review r7: the inputFiles() fast path trusted leaf-scan file
    counts even when a shuffle sat between scan and call — an
    AQE-coalesced post-aggregate frame (1-2 partitions) then serialized
    the ~200x shingle explode on one task. The scan-backed gate must
    reject any frame with an exchange and fall through to the
    authoritative rdd probe, which repartitions."""
    from datafusion_federation_spark.operators.dedup import (
        _fan_out, _scan_backed)
    import pyspark.sql.functions as F
    base = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(100)], "id int, text string")
    # post-shuffle frame: groupBy collapses to few partitions under AQE
    shuffled = (base.groupBy("id").agg(F.first("text").alias("text"))
                .coalesce(1))
    assert not _scan_backed(shuffled)
    want = spark.sparkContext.defaultParallelism
    assert _fan_out(shuffled).rdd.getNumPartitions() >= min(want, 100)


def test_scan_backed_true_for_filtered_scan(spark, tmp_path):
    """The fast path stays available where its file bound is sound:
    a parquet scan under narrow ops only (project/filter)."""
    from datafusion_federation_spark.operators.dedup import _scan_backed
    p = str(tmp_path / "sb.parquet")
    spark.range(10).selectExpr("id", "cast(id as string) s") \
        .write.parquet(p)
    df = spark.read.parquet(p).where("id > 2").select("s")
    assert _scan_backed(df)


# ---------------------------------------------------------------------------
# Product quantization (r7)
# ---------------------------------------------------------------------------

def _pq_frame(spark, n=40, dim=8, seed=3):
    import random
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_matches_brute_argmin(spark):
    from datafusion_federation_spark.operators.similarity import (
        pq_encode)
    df = _pq_frame(spark, n=30, dim=8)
    rows = {r.vec_id: [float(x) for x in r.embedding]
            for r in df.collect()}
    cents = {cid: rows[cid] for cid in sorted(rows)[:4]}
    got = {(r.vec_id, r.j): r.code
           for r in pq_encode(df, "embedding", "vec_id", dim=8,
                              m=2, n_codes=4).collect()}
    for vid, v in rows.items():
        for j in range(2):
            best = min(
                (sum((v[j * 4 + i] - c[j * 4 + i]) ** 2
                     for i in range(4)), cid)
                for cid, c in cents.items())[1]
            assert got[(vid, j)] == best, (vid, j)


def test_pq_centroid_rows_encode_to_themselves(spark):
    """A vector that IS a codeword has distance 0 to itself in every
    subspace: codes must be its own id and the exact ADC recovers the
    full-precision query distance."""
    from datafusion_federation_spark.operators.similarity import (
        pq_adc_topk, pq_encode)
    df = _pq_frame(spark, n=4, dim=8)   # corpus == codebook
    got = {(r.vec_id, r.j): r.code
           for r in pq_encode(df, "embedding", "vec_id", dim=8,
                              m=2, n_codes=4).collect()}
    assert all(code == vid for (vid, _), code in got.items())
    q = [0.0] * 8
    rows = {r.vec_id: [float(x) for x in r.embedding]
            for r in df.collect()}
    r = pq_adc_topk(df, "embedding", q, k=4, dim=8, m=2,
                    n_codes=4).collect()
    for row in r:
        exact = sum(x * x for x in rows[row.vec_id])
        assert abs(row.adc - exact) < 1e-5, (row, exact)


def test_pq_layout_invariance(spark):
    from datafusion_federation_spark.operators.similarity import (
        pq_adc_topk)
    df = _pq_frame(spark, n=50, dim=8)
    q = [0.3] * 8
    a = [tuple(r) for r in pq_adc_topk(df, "embedding", q, k=10,
                                       dim=8, m=4,
                                       n_codes=4).collect()]
    b = [tuple(r) for r in pq_adc_topk(df.repartition(7), "embedding",
                                       q, k=10, dim=8, m=4,
                                       n_codes=4).collect()]
    assert a == b


def test_pq_validation(spark):
    from datafusion_federation_spark.operators.similarity import (
        pq_adc_topk, pq_encode)
    df = _pq_frame(spark, n=10, dim=8)
    with pytest.raises(ValueError, match="must divide"):
        pq_encode(df, "embedding", "vec_id", dim=8, m=3)
    with pytest.raises(ValueError, match="query dim"):
        pq_adc_topk(df, "embedding", [0.0] * 5, dim=8, m=2)


# ---------------------------------------------------------------------------
# r9: stdlib image decode (multimodal) — real binary parsing, no PIL
# ---------------------------------------------------------------------------

def test_image_decode_round_trips_ppm_and_bmp():
    import random

    from datafusion_federation_spark.operators.multimodal import (
        decode_image, encode_bmp24, encode_ppm_p6)
    rng = random.Random(11)
    for w, h in [(1, 1), (2, 3), (5, 4), (7, 2), (4, 7), (3, 3)]:
        ras = bytes(rng.randrange(256) for _ in range(w * h * 3))
        for enc, codec in ((encode_ppm_p6, "ppm/p6"),
                           (encode_bmp24, "bmp/rgb24")):
            d = decode_image(enc(w, h, ras))
            assert (d["width"], d["height"], d["codec"]) == (w, h, codec)
            assert d["raster"] == ras, \
                f"{codec} {w}x{h}: raster mismatch (padding/BGR/row " \
                f"order bug)"


def test_image_decode_ppm_header_with_comments():
    from datafusion_federation_spark.operators.multimodal import (
        decode_image)
    ras = bytes(range(2 * 2 * 3))
    payload = b"P6\n# a comment\n2 2\n# another\n255\n" + ras
    d = decode_image(payload)
    assert (d["width"], d["height"]) == (2, 2) and d["raster"] == ras


def test_image_decode_refuses_compressed_and_deep():
    import pytest

    from datafusion_federation_spark.operators.multimodal import (
        decode_image, real_decode)
    # r11: JPEG magic now routes to the REAL baseline parser — a
    # garbage body after SOI is a corrupt file (ValueError), not a
    # refusal, on both entry points
    jpeg_magic = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    with pytest.raises(ValueError):
        decode_image(jpeg_magic)
    with pytest.raises(ValueError):
        real_decode(jpeg_magic)
    # a codec with NO parser here still refuses with the honest stub
    with pytest.raises(NotImplementedError, match="ffmpeg-class"):
        real_decode(b"ID3\x04" + b"\x00" * 64)      # MP3
    # r10: PNG magic now routes to the REAL parser — garbage after the
    # signature is a corrupt file (ValueError), not a refusal
    png_garbage = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    with pytest.raises(ValueError):
        decode_image(png_garbage)
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_real_decode_routes_uncompressed():
    from datafusion_federation_spark.operators.multimodal import (
        encode_ppm_p6, real_decode)
    ras = bytes(range(1 * 2 * 3))
    d = real_decode(encode_ppm_p6(1, 2, ras))
    assert d["codec"] == "ppm/p6" and d["raster"] == ras


def test_extract_image_stats_plan_is_mapinpandas(spark):
    from pyspark.sql import functions as F, types as T

    from datafusion_federation_spark.operators.multimodal import (
        encode_ppm_p6, extract_image_stats)
    rows = [(i, encode_ppm_p6(2, 2, bytes(((i * 7 + j) % 256)
                                          for j in range(12))))
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    out = extract_image_stats(df)
    got = {r.doc_id: (r.width, r.height, r.sum_r, r.sum_g, r.sum_b,
                      r.n_px) for r in out.collect()}
    for i in range(6):
        vals = [(i * 7 + j) % 256 for j in range(12)]
        assert got[i] == (2, 2, sum(vals[0::3]), sum(vals[1::3]),
                          sum(vals[2::3]), 4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_wav_decode_round_trips():
    import random

    from datafusion_federation_spark.operators.multimodal import (
        decode_wav, encode_wav_pcm16)
    rng = random.Random(5)
    for rate, ch, fr in [(8000, 1, 13), (16000, 2, 40), (44100, 2, 7)]:
        samples = [rng.randrange(-32768, 32768) for _ in range(fr * ch)]
        d = decode_wav(encode_wav_pcm16(rate, ch, samples))
        assert (d["sample_rate"], d["channels"], d["n_frames"],
                d["codec"]) == (rate, ch, fr, "wav/pcm16")
        assert d["samples"] == samples
        assert d["duration_ms"] == fr * 1000 // rate


def test_wav_decode_skips_extra_chunks_and_refuses_nonpcm():
    import struct

    import pytest

    from datafusion_federation_spark.operators.multimodal import (
        decode_wav, encode_wav_pcm16, real_decode)
    b = encode_wav_pcm16(8000, 1, [1, -2, 3])
    # inject a LIST chunk before fmt/data: the chunk walk must skip it
    rest = b[12:]                      # fmt + data chunks
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    b2 = (b"RIFF" + struct.pack("<I", 4 + len(lst) + len(rest))
          + b"WAVE" + lst + rest)
    assert decode_wav(b2)["samples"] == [1, -2, 3]
    # real_decode routes WAV; non-PCM refuses with the honest error
    assert real_decode(b)["codec"] == "wav/pcm16"
    bad = bytearray(b)
    bad[20] = 3                        # format tag 3 = IEEE float
    with pytest.raises(NotImplementedError, match="PCM-16"):
        decode_wav(bytes(bad))


def test_avi_decode_round_trips():
    import random

    from datafusion_federation_spark.operators.multimodal import (
        decode_avi_dib, encode_avi_dib)
    rng = random.Random(3)
    for w, h, fps, nf in [(2, 3, 10, 4), (5, 2, 25, 1), (3, 3, 5, 6)]:
        frames = [bytes(rng.randrange(256) for _ in range(w * h * 3))
                  for _ in range(nf)]
        d = decode_avi_dib(encode_avi_dib(w, h, fps, frames))
        assert (d["width"], d["height"], d["fps"], d["n_frames"],
                d["codec"]) == (w, h, fps, nf, "avi/dib24")
        assert d["frames"] == frames, \
            "frame raster mismatch (nesting/stride/BGR/flip bug)"
        assert d["duration_ms"] == nf * (1_000_000 // fps) // 1000


def test_avi_decode_refuses_compressed_and_routes():
    import pytest

    from datafusion_federation_spark.operators.multimodal import (
        decode_avi_dib, encode_avi_dib, real_decode)
    b = encode_avi_dib(2, 2, 10, [bytes(range(12))])
    assert real_decode(b)["codec"] == "avi/dib24"
    # swap the stream handler to MJPG: must refuse, not misdecode
    bad = b.replace(b"vidsDIB ", b"vidsMJPG")
    with pytest.raises(NotImplementedError, match="raw-DIB"):
        decode_avi_dib(bad)


def test_frame_sample_real_every_n(spark):
    from datafusion_federation_spark.operators.multimodal import (
        encode_avi_dib, frame_sample_real)
    rows = []
    for i in range(4):
        frames = [bytes(((i * 7 + f * 97 + j) % 256)
                        for j in range(2 * 2 * 3)) for f in range(5)]
        rows.append((i, encode_avi_dib(2, 2, 10, frames)))
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    out = frame_sample_real(df, every_n=2)
    got = {(r.doc_id, r.frame_idx): (r.frame_ts_ms, r.sum_r)
           for r in out.collect()}
    assert set(fi for _, fi in got) == {0, 2, 4}, "every-2nd sampling"
    for (i, fi), (ts, sr) in got.items():
        vals = [(i * 7 + fi * 97 + j) % 256 for j in range(12)]
        assert ts == fi * 100 and sr == sum(vals[0::3])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


# ---------------------------------------------------------------------------
# r10: REAL PNG decode — stdlib zlib inflate + the five scanline filters
# ---------------------------------------------------------------------------

def test_png_short_row_filters_raises():
    """r12 (ADVICE r11 #5): a caller-supplied row_filters shorter than
    the image height raises instead of silently cycling — a fixture
    that believes it pinned per-scanline filter types must learn it
    did not."""
    import pytest

    from datafusion_federation_spark.operators.multimodal import (
        encode_png)
    ras = bytes(range(0, 90, 1))       # 5x6 RGB = 90 bytes
    with pytest.raises(ValueError, match="row_filters"):
        encode_png(5, 6, ras, row_filters=[0, 1])


def test_png_round_trips_every_filter_type():
    import random

    from datafusion_federation_spark.operators.multimodal import (
        decode_image, encode_png)
    rng = random.Random(42)
    # each filter type alone, then the all-five cycle, RGB and RGBA
    for filters in [[f] * 6 for f in range(5)] + [None]:
        for use_alpha in (False, True):
            w, h = 5, 6
            ras = bytes(rng.randrange(256) for _ in range(w * h * 3))
            alpha = (bytes(rng.randrange(256) for _ in range(w * h))
                     if use_alpha else None)
            d = decode_image(encode_png(w, h, ras, alpha=alpha,
                                        row_filters=filters))
            assert d["raster"] == ras
            assert (d["width"], d["height"]) == (w, h)
            assert d["codec"] == ("png/rgba8" if use_alpha
                                  else "png/rgb8")


def test_png_grayscale_hand_built():
    # hand-built gray PNG (color type 0) — not producible by encode_png,
    # so the decoder's gray path is pinned against a manual chunk layout
    import struct
    import zlib

    from datafusion_federation_spark.operators.multimodal import (
        decode_image)
    w, h = 3, 2
    gray = bytes([10, 20, 30, 40, 50, 60])
    rows = b"".join(b"\x00" + gray[r * w:(r + 1) * w] for r in range(h))

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(rows))
           + chunk(b"IEND", b""))
    d = decode_image(png)
    assert d["codec"] == "png/gray8"
    assert d["raster"] == bytes(v for v in gray for _ in range(3))


def test_png_decodes_real_world_files():
    # cross-check against PNGs this repo did not produce (Python docs /
    # gitweb ship with the container) — catches spec misreadings an
    # encode/decode round trip would cancel out
    import glob
    import os

    import pytest

    from datafusion_federation_spark.operators.multimodal import (
        decode_image)
    files = sorted(glob.glob("/usr/share/doc/python3/_static/*.png")
                   + glob.glob("/usr/share/gitweb/static/*.png"))
    if not files:
        pytest.skip("no system PNGs in this container")
    decoded = 0
    for f in files:
        with open(f, "rb") as fh:
            b = fh.read()
        # r11: EVERY valid PNG decodes now (Adam7 + 16-bit landed) —
        # a NotImplementedError here is a regression, not a refusal
        d = decode_image(b)
        assert d["width"] > 0 and d["height"] > 0
        assert len(d["raster"]) == d["width"] * d["height"] * 3
        decoded += 1
    # r10: RGBA, gray, AND palette (pal8 logo, pal2 favicon) all decode
    assert decoded >= 4, f"expected the system PNGs to decode, got " \
        f"{decoded} of {len(files)}"


def test_png_subbyte_and_palette_hand_built():
    """Sub-byte gray (bit depths 1/2/4), palette via PLTE, and
    gray+alpha — hand-built chunk layouts with known pixel values."""
    import struct
    import zlib

    from datafusion_federation_spark.operators.multimodal import (
        decode_image)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # depth-4 gray 5x2 (odd width: the last nibble pads)
    vals = [[1, 15, 0, 7, 8], [3, 4, 5, 6, 2]]
    rows = b""
    for r in range(2):
        packed, byte, nb = bytearray(), 0, 0
        for v in vals[r]:
            byte, nb = (byte << 4) | v, nb + 1
            if nb == 2:
                packed.append(byte)
                byte, nb = 0, 0
        if nb:
            packed.append(byte << 4)
        rows += b"\x00" + bytes(packed)
    png = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                            5, 2, 4, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))
    d = decode_image(png)
    assert d["codec"] == "png/gray4"
    assert d["raster"] == bytes(v * 17 for row in vals
                                for v in row for _ in range(3))
    # depth-2 palette 4x2
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = [[0, 1, 2, 3], [3, 2, 1, 0]]
    rows = b"".join(
        b"\x00" + bytes([(r[0] << 6) | (r[1] << 4) | (r[2] << 2) | r[3]])
        for r in idx)
    png = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                            4, 2, 2, 3, 0, 0, 0))
           + chunk(b"PLTE", pal)
           + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))
    d = decode_image(png)
    assert d["codec"] == "png/pal2"
    assert d["raster"] == b"".join(pal[i * 3:i * 3 + 3]
                                   for row in idx for i in row)
    # gray+alpha 8-bit: alpha drops, gray replicates
    rows = b"\x00" + bytes([100, 255, 200, 0])
    png = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                            2, 1, 8, 4, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(rows)) + chunk(b"IEND", b""))
    d = decode_image(png)
    assert d["codec"] == "png/graya8"
    assert d["raster"] == bytes([100] * 3 + [200] * 3)


def test_png_refusals_and_corruption():
    import struct
    import zlib

    import pytest

    from datafusion_federation_spark.operators.multimodal import (
        decode_image, encode_png)
    good = encode_png(4, 3, bytes(range(36)))

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # CRC corruption is detected
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF                      # inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_image(bytes(bad_crc))
    # truncated file
    with pytest.raises(ValueError):
        decode_image(good[:len(good) // 2])
    # chunk length lying past EOF
    lying = bytearray(good)
    lying[8:12] = struct.pack(">I", 10_000)  # IHDR length
    with pytest.raises(ValueError, match="EOF"):
        decode_image(bytes(lying))
    # r11: Adam7 and 16-bit DECODE now (graduated from the r10
    # refusals); an Adam7 stream sized for the old sequential layout
    # (2 rows x (1+6) = 14 bytes instead of the 15 the pass layout
    # demands) is corrupt, not unsupported
    adam_bad = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                                 2, 2, 8, 2, 0, 0, 1))
                + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR dims"):
        decode_image(adam_bad)
    ras22 = bytes(range(12))
    d = decode_image(encode_png(2, 2, ras22, interlace=True))
    assert d["codec"] == "png/rgb8i" and d["raster"] == ras22
    d = decode_image(encode_png(2, 2, ras22, depth=16))
    assert d["codec"] == "png/rgb16" and d["raster"] == ras22
    # 16-bit PALETTE is outside the spec's valid combinations
    p16pal = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                               2, 2, 16, 3, 0, 0, 0))
              + chunk(b"PLTE", bytes([1, 2, 3]))
              + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
              + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="outside the spec"):
        decode_image(p16pal)
    # palette file with a missing PLTE is corrupt, not unsupported
    p3 = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                           2, 2, 8, 3, 0, 0, 0))
          + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x00\x03\x00"))
          + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="PLTE"):
        decode_image(p3)
    # palette index past the PLTE is corrupt
    p3b = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                            2, 2, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", bytes([1, 2, 3]))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x05\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_image(p3b)
    # IDAT byte count disagreeing with IHDR dims (zip-bomb posture:
    # inflate is BOUNDED by the dims, never by the attacker's stream)
    bomb = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                             2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR dims"):
        decode_image(bomb)
    # zero dimensions
    zero = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB",
                                             0, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b""))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="zero"):
        decode_image(zero)


def test_png_adam7_and_16bit_round_trip_every_combination():
    """r11 (VERDICT r10 Next #3): the scatter decoder — Adam7 pass
    geometry x 16-bit channels x alpha, across dims that exercise
    empty passes (w or h < pass origin) and single-pixel passes. The
    encoder expands 8-bit v to the canonical v*257, so MSB
    downsampling must round-trip EXACTLY."""
    import itertools

    from datafusion_federation_spark.operators.multimodal import (
        decode_image, encode_png)
    for w, h in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 10), (1, 9),
                 (9, 1), (16, 17)]:
        ras = bytes((w * 33 + j * 7) % 256 for j in range(w * h * 3))
        al = bytes((j * 13) % 256 for j in range(w * h))
        for inter, d16, alpha in itertools.product(
                (False, True), (False, True), (None, al)):
            b = encode_png(w, h, ras, alpha=alpha,
                           depth=16 if d16 else 8, interlace=inter)
            d = decode_image(b)
            assert d["raster"] == ras, (w, h, inter, d16, bool(alpha))
            base = "rgba" if alpha is not None else "rgb"
            assert d["codec"] == (f"png/{base}{16 if d16 else 8}"
                                  + ("i" if inter else ""))


def test_jpeg_block_constant_gray_decodes_exactly():
    """r11 (VERDICT r10 Next #4): the d98 exactness basis — block-
    constant grayscale under the all-ones quantizer decodes EXACTLY
    (only the DC coefficient is nonzero), with and without restart
    markers, through REAL Huffman/byte-stuffed entropy data."""
    import numpy as np

    from datafusion_federation_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_baseline)
    for w, h, rst in [(8, 8, 0), (16, 8, 0), (24, 16, 0),
                      (16, 16, 1), (24, 8, 2)]:
        nbx = w // 8
        g = bytes((((y // 8) * nbx + (x // 8)) * 29 + 7) % 256
                  for y in range(h) for x in range(w))
        b = encode_jpeg_baseline(w, h, gray=g, quant=1,
                                 restart_interval=rst)
        d = decode_jpeg(b)
        got = np.frombuffer(d["raster"], np.uint8).reshape(h, w, 3)
        want = np.frombuffer(g, np.uint8).reshape(h, w)
        assert np.array_equal(got[..., 0], want), (w, h, rst)
        assert np.array_equal(got[..., 1], want)
        assert np.array_equal(got[..., 2], want)
        assert d["codec"] == "jpeg/baseline-gray"


def test_jpeg_color_round_trip_within_tolerance():
    """Color 4:4:4 and 4:2:0 through the full pipeline (RGB->YCbCr,
    FDCT, quantize, Huffman, decode back): with the all-ones
    quantizer the only loss is color-convert rounding — pinned at
    +-1 per channel. 4:2:0 uses r=g=b inputs (constant chroma) so
    the subsampling itself is lossless and the tolerance stays 1."""
    import numpy as np

    from datafusion_federation_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_baseline)
    w, h = 24, 16
    ras = bytes(((x * 7 + y * 3 + c * 5) % 256)
                for y in range(h) for x in range(w) for c in range(3))
    d = decode_jpeg(encode_jpeg_baseline(w, h, raster=ras, quant=1))
    got = np.frombuffer(d["raster"], np.uint8).astype(int)
    want = np.frombuffer(ras, np.uint8).astype(int)
    assert np.max(np.abs(got - want)) <= 1
    assert d["codec"] == "jpeg/baseline"
    grayv = bytes(((x * 5 + y * 11) % 256)
                  for y in range(h) for x in range(w))
    ras4 = bytes(v for v in grayv for _ in range(3))
    d4 = decode_jpeg(encode_jpeg_baseline(w, h, raster=ras4, quant=1,
                                          subsample=True))
    got4 = np.frombuffer(d4["raster"], np.uint8).astype(int)
    want4 = np.frombuffer(ras4, np.uint8).astype(int)
    assert np.max(np.abs(got4 - want4)) <= 1
    assert d4["codec"] == "jpeg/baseline-420"
    # odd (non-MCU-aligned) dims crop correctly
    w, h = 13, 9
    ras5 = bytes(((x * 9 + y * 2 + c) % 256)
                 for y in range(h) for x in range(w) for c in range(3))
    d5 = decode_jpeg(encode_jpeg_baseline(w, h, raster=ras5, quant=2,
                                          subsample=True))
    assert (d5["width"], d5["height"]) == (w, h)
    assert len(d5["raster"]) == w * h * 3


def test_jpeg_refusals_and_corruption():
    import struct

    import pytest

    from datafusion_federation_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_baseline)
    w, h = 16, 8
    good = encode_jpeg_baseline(w, h, gray=bytes(w * h), quant=1)
    # marker family refusals carry the shape's name
    for sof_byte, msg in [(0xC3, "lossless"), (0xC9, "arithmetic")]:
        bad = bytearray(good)
        idx = bad.find(b"\xFF\xC0")
        bad[idx + 1] = sof_byte
        with pytest.raises(NotImplementedError, match=msg):
            decode_jpeg(bytes(bad))
    # r11: SOF2 DECODES now — but a baseline stream relabeled SOF2 is
    # CORRUPT (a progressive scan may not carry DC and AC together)
    bad = bytearray(good)
    idx = bad.find(b"\xFF\xC0")
    bad[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="both DC"):
        decode_jpeg(bytes(bad))
    # truncated scan data
    with pytest.raises(ValueError, match="truncated|EOF"):
        decode_jpeg(good[:len(good) - 8])
    # lying segment length
    lying = bytearray(good)
    idx = lying.find(b"\xFF\xDB")
    lying[idx + 2:idx + 4] = struct.pack(">H", 60000)
    with pytest.raises(ValueError, match="EOF"):
        decode_jpeg(bytes(lying))
    # zero quantizer entry
    zq = bytearray(good)
    idx = zq.find(b"\xFF\xDB")
    zq[idx + 5] = 0          # first table entry
    with pytest.raises(ValueError, match="zero quantizer"):
        decode_jpeg(bytes(zq))
    # overfull Huffman table (BITS sum lies)
    oh = bytearray(good)
    idx = oh.find(b"\xFF\xC4")
    oh[idx + 5] = 255        # BITS[1] = 255 codes of length 1
    with pytest.raises(ValueError, match="DHT"):
        decode_jpeg(bytes(oh))
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_real_world_progressive_files_decode():
    """r11: the container's only real JPEGs are PROGRESSIVE (nodejs
    doc 'white-stripe' images) — files this repo did not produce.
    They must DECODE now (spectral selection + successive
    approximation, the libjpeg default scan script), and their
    content must look like what the filenames say: mostly white."""
    import glob

    import numpy as np
    import pytest

    from datafusion_federation_spark.operators.jpeg import decode_jpeg
    files = sorted(glob.glob("/usr/share/doc/nodejs/*.jpg"))
    if not files:
        pytest.skip("no system JPEGs in this container")
    for f in files:
        with open(f, "rb") as fh:
            b = fh.read()
        d = decode_jpeg(b)
        assert d["codec"].startswith("jpeg/progressive")
        ras = np.frombuffer(d["raster"], np.uint8)
        assert len(ras) == d["width"] * d["height"] * 3
        assert float(ras.mean()) > 220 and int(ras.max()) == 255


def test_jpeg_progressive_equals_baseline_decode():
    """The strongest progressive pin: our progressive encoder emits
    the libjpeg-style scan script (DC first at Al=1, AC band scans,
    DC refinement, AC refinement with EOBn runs and correction bits)
    over the SAME quantized coefficients as the baseline encoder —
    a correct decoder must return byte-identical rasters for both
    encodings, across gray/color, quantizers, and non-MCU-aligned
    dims."""
    import numpy as np

    from datafusion_federation_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_baseline, encode_jpeg_progressive)
    rng = np.random.default_rng(7)
    for (w, h, quant, color) in [(8, 8, 1, False), (16, 8, 1, False),
                                 (24, 16, 1, True), (13, 9, 2, True),
                                 (16, 16, 8, True), (8, 8, 40, True),
                                 (17, 23, 3, True), (64, 8, 1, False)]:
        if color:
            ras = rng.integers(0, 256, w * h * 3,
                               dtype=np.uint8).tobytes()
            bb = encode_jpeg_baseline(w, h, raster=ras, quant=quant)
            bp = encode_jpeg_progressive(w, h, raster=ras, quant=quant)
        else:
            g = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
            bb = encode_jpeg_baseline(w, h, gray=g, quant=quant)
            bp = encode_jpeg_progressive(w, h, gray=g, quant=quant)
        db, dp = decode_jpeg(bb), decode_jpeg(bp)
        assert db["raster"] == dp["raster"], (w, h, quant, color)
        assert dp["codec"].startswith("jpeg/progressive")
    # 4:2:0 subsampled progressive (per-component AC scans cover the
    # chroma's SMALLER real block grid) and band-split scans (1..8 /
    # 9..63, per-band EOBRUN state — the real-file scan script)
    for (w, h, quant, split) in [(16, 16, 1, None), (13, 9, 2, 8),
                                 (32, 24, 8, 8), (9, 9, 1, None)]:
        ras = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        bb = encode_jpeg_baseline(w, h, raster=ras, quant=quant,
                                  subsample=True)
        bp = encode_jpeg_progressive(w, h, raster=ras, quant=quant,
                                     subsample=True, band_split=split)
        db, dp = decode_jpeg(bb), decode_jpeg(bp)
        assert db["raster"] == dp["raster"], (w, h, quant, split)
        assert dp["codec"] == "jpeg/progressive-420"
    # block-constant gray (the d99 fixture shape): the EOBRUN-heavy
    # path — entire AC scans are end-of-band runs — decodes EXACTLY
    g = bytes((((x // 8) + (y // 8) * 3) * 29 + 5) % 256
              for y in range(24) for x in range(24))
    dp = decode_jpeg(encode_jpeg_progressive(24, 24, gray=g, quant=1))
    got = np.frombuffer(dp["raster"], np.uint8).reshape(24, 24, 3)
    assert np.array_equal(got[..., 0],
                          np.frombuffer(g, np.uint8).reshape(24, 24))


def test_payload_fn_fusion_matches_bytes_path(spark):
    """r13 optimization round: the extractors' payload_fn seam (fixture
    build fused into the decode crossing, guide §4.1) must produce
    EXACTLY the rows of the two-step bytes path, and the fused plan
    must contain ONE MapInPandas node instead of two."""
    from datafusion_federation_spark.operators.multimodal import (
        encode_avi_dib, encode_ppm_p6, encode_wav_pcm16,
        extract_audio_stats, extract_image_stats, frame_sample_real)

    meta = spark.createDataFrame([(i, 10 + i) for i in range(6)],
                                 "doc_id LONG, n_chars LONG")

    def img(did, nc):
        n = int(nc) % 3 + 2
        return encode_ppm_p6(n, 2, bytes((did * 7 + j) % 256
                                         for j in range(n * 2 * 3)))

    def wav(did, nc):
        ch = 1 + did % 2
        return encode_wav_pcm16(
            8000, ch, [(did * 13 + k) % 4001 - 2000
                       for k in range((int(nc) % 5 + 2) * ch)])

    def avi(did, nc):
        nf = int(nc) % 3 + 2
        return encode_avi_dib(3, 2, 10, [
            bytes((did * 7 + f * 97 + j) % 256 for j in range(18))
            for f in range(nf)])

    for extractor, builder in ((extract_image_stats, img),
                               (extract_audio_stats, wav),
                               (frame_sample_real, avi)):
        two_step = extractor(spark.createDataFrame(
            [(i, builder(i, 10 + i)) for i in range(6)],
            "doc_id LONG, payload BINARY"))
        fused = extractor(meta, payload_fn=builder)
        assert sorted(map(tuple, two_step.collect())) == \
            sorted(map(tuple, fused.collect()))
        plan = fused._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 1
