"""Similarity search over embedding columns (array<float>).

North-star extension (BASELINE.json): brute-force cosine top-k as the
correctness baseline, plus an LSH-bucketed ANN variant as the 100 TB scale
path. Dot products use built-in higher-order functions (zip_with +
aggregate) so scoring runs JVM-side inside codegen — no Python in the
hot loop.

Scale notes:
- brute force is a single narrow projection + TopK (no shuffle except the
  final k-row ordering): linear scan, embarrassingly parallel, the right
  baseline even on a 1000-executor cluster.
- ann_lsh buckets the corpus by random-hyperplane signature; queries probe
  only matching buckets (multi-probe = hamming-1 neighbors). The bucket id
  is the shuffle/partition key, so a 100 TB corpus can be bucketed once
  (written partitioned by signature) and probed with partition pruning.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    # element-wise double cast BEFORE multiply: float32 arithmetic would
    # accumulate differently than the (double-typed) oracle SQL
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_score(vec_col, query: Sequence[float]) -> F.Column:
    """Cosine similarity of an array column against a literal query vector,
    computed with deterministic left-to-right double accumulation."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return _dot(vec_col, q) / (_norm(vec_col) * _norm(q))


def cosine_topk(df: DataFrame, vec_col: str, query: Sequence[float],
                k: int = 10, id_col: str = "vec_id",
                round_digits: Optional[int] = 6) -> DataFrame:
    """Brute-force cosine top-k: score every row, take k. Deterministic
    tie-break on id."""
    score = cosine_score(F.col(vec_col), query)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (df.select(F.col(id_col), score.alias("score"))
              .orderBy(F.col("score").desc(), F.col(id_col))
              .limit(k))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42
                       ) -> List[List[float]]:
    """Deterministic unit-less gaussian hyperplanes (seeded PRNG, no
    Date/entropy dependence)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def lsh_signature(vec_col, planes: Sequence[Sequence[float]]) -> F.Column:
    """Random-hyperplane signature as an int bucket id: bit i = sign of
    dot(vec, plane_i). Pure built-ins."""
    bits = []
    for i, p in enumerate(planes):
        q = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec_col, q) > 0, F.lit(1 << i))
                     .otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ann_lsh_topk(df: DataFrame, vec_col: str, query: Sequence[float],
                 k: int = 10, id_col: str = "vec_id",
                 n_planes: int = 8, seed: int = 42,
                 multiprobe: bool = True,
                 round_digits: Optional[int] = 6) -> DataFrame:
    """ANN: restrict the exact cosine scan to rows whose LSH bucket matches
    the query's bucket (or differs by one bit when multiprobe). Recall is
    probabilistic; the exact rerank inside the probed buckets is not."""
    planes = random_hyperplanes(len(query), n_planes, seed)
    sig = lsh_signature(F.col(vec_col), planes)
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(p, query)) > 0:
            qsig |= (1 << i)
    probes = [qsig]
    if multiprobe:
        probes += [qsig ^ (1 << i) for i in range(n_planes)]
    bucketed = df.withColumn("__bucket", sig).filter(
        F.col("__bucket").isin(probes))
    score = cosine_score(F.col(vec_col), query)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (bucketed.select(F.col(id_col), score.alias("score"))
                    .orderBy(F.col("score").desc(), F.col(id_col))
                    .limit(k))


def ivf_topk(df: DataFrame, vec_col: str, query: Sequence[float],
             k: int = 10, id_col: str = "vec_id",
             n_clusters: int = 16, n_probe: int = 4, seed: int = 42,
             max_iter: int = 8,
             round_digits: Optional[int] = 6) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into k-means cells,
    probe only the ``n_probe`` cells whose centroids are nearest to the
    query, exact cosine rerank inside them.

    Scale path: the cell id is a partition key — a 100 TB corpus is
    clustered once (model persisted, data written partitioned by cell),
    then each query scans n_probe/n_clusters of the data with partition
    pruning. Here the model is fit per call (the fixture is small);
    recall is probabilistic like any ANN, the in-cell rerank is exact.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn(
        "__v", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="__v",
                   predictionCol="__cell", maxIter=max_iter).fit(feats)
    assigned = model.transform(feats)

    # nearest n_probe centroids to the query (tiny, driver-side)
    import math
    qn = math.sqrt(sum(x * x for x in query))
    sims = []
    for i, c in enumerate(model.clusterCenters()):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        dot = sum(a * b for a, b in zip(c, query))
        sims.append((dot / (cn * qn), i))
    probes = [i for _, i in sorted(sims, reverse=True)[:n_probe]]

    score = cosine_score(F.col(vec_col), query)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (assigned.filter(F.col("__cell").isin(probes))
            .select(F.col(id_col), score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def ivf_fixed_topk(df: DataFrame, vec_col: str, query: Sequence[float],
                   k: int = 10, id_col: str = "vec_id",
                   n_clusters: int = 8, n_probe: int = 4,
                   round_digits: Optional[int] = 6) -> DataFrame:
    """IVF ANN with DETERMINISTIC centroids — the oracle twin of
    ``ivf_topk``. K-means centroids are model-dependent (seed + iteration
    order), so ivf_topk can only be checked rows-only; this variant seeds
    the cells with the embeddings of the ``n_clusters`` lowest-id rows and
    runs ONE assignment pass, making the whole pipeline a pure function of
    the data that any SQL engine reproduces exactly (same IEEE double
    accumulation order as cosine_topk's oracle).

    Same physical skeleton as the ivf_topk scale path: centroids are a
    tiny broadcast; the assignment cross join produces K rows per vector
    that collapse MAP-SIDE (max_by partial aggregation), so the one
    shuffle carries a single pre-aggregated row per vector; probed cells
    prune before the exact rerank. At 100 TB the assignment output is
    written partitioned by cell once, and each query scans
    n_probe/n_clusters of the corpus via partition pruning."""
    from pyspark.sql import Window as W

    cent = (df.orderBy(id_col).limit(n_clusters)
              .select(F.col(id_col).alias("__cid"),
                      F.col(vec_col).alias("__cvec")))
    cos_c = (_dot(F.col(vec_col), F.col("__cvec"))
             / (_norm(F.col(vec_col)) * _norm(F.col("__cvec"))))
    # nearest centroid per vector: max_by over (cos desc, cid asc) —
    # the struct's second slot negates cid so struct-max picks the
    # LOWEST cid on a cosine tie (mirrors the oracle's ROW_NUMBER
    # ORDER BY cos DESC, cid ASC)
    assigned = (df.crossJoin(F.broadcast(cent))
                .groupBy(id_col)
                .agg(F.max_by(
                         F.col("__cid"),
                         F.struct(cos_c.alias("c"),
                                  (-F.col("__cid")).alias("t")))
                     .alias("__cell"),
                     F.first(F.col(vec_col)).alias(vec_col)))
    probes = (cent.withColumn("__qcos", cosine_score(F.col("__cvec"), query))
                  .withColumn("__rn", F.row_number().over(
                      W.partitionBy().orderBy(F.col("__qcos").desc(),
                                              F.col("__cid"))))
                  .filter(F.col("__rn") <= n_probe)
                  .select(F.col("__cid").alias("__cell")))
    score = cosine_score(F.col(vec_col), query)
    if round_digits is not None:
        score = F.round(score, round_digits)
    return (assigned.join(F.broadcast(probes), on="__cell", how="left_semi")
            .select(F.col(id_col), score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))


def pairwise_cosine_pairs(df: DataFrame, vec_col: str, id_col: str,
                          dim: int,
                          threshold: float = 0.9,
                          n_planes: int = 8, seed: int = 42,
                          max_bucket: int = 256) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket the corpus, compare only
    within buckets (id_a < id_b), keep pairs above threshold — the
    embedding analog of MinHash dedup. Bucket key join instead of O(N^2).

    ``dim`` is passed explicitly (no driver-side .first() probe — the
    operator stays a pure plan transformation with no eager action).

    r13 (optimization round): pair generation via groupBy + in-bucket
    combinations, NOT a self-join — the self-join re-executed the whole
    signature lineage (n_planes x dim dot products) for BOTH sides and
    shuffled (id, vec, bucket) twice; this is the same shape the
    MinHash/SimHash candidate paths use (_lsh_candidates rationale).
    One signature pass, one shuffle keyed on the bucket, per-bucket
    ordered-pair expansion (each row has exactly ONE bucket, so a pair
    can never appear twice — no distinct needed). The exact-cosine
    expression is unchanged, so emitted values are bit-identical
    (pinned: test_embedding_near_pairs_pinned; d08/d38 oracles; bench
    before/after in OPTIMIZATION_r13.md).

    ``max_bucket`` (r14, VERDICT r13 What's-wrong #2): the in-row pair
    expansion of a bucket with n members materializes ~n^2/2 structs
    EACH CARRYING BOTH VECTORS in one row's memory — a pathological hot
    bucket (many near-identical embeddings) turns a spillable join into
    an executor OOM. Buckets larger than ``max_bucket`` therefore take
    a FALLBACK lane: their members are exploded back to rows and pair
    via a plain self-join on the bucket key (position-ordered, so each
    unordered pair appears exactly once) — quadratic ROWS streaming
    through a spillable SortMergeJoin instead of a quadratic in-memory
    ARRAY. Both lanes are exact and disjoint (a bucket is entirely in
    one lane), so the result set is IDENTICAL for any cap value; both
    read the same bucket aggregate, which the engine executes once
    (ReusedExchange) — on a benign corpus the hot lane is empty and
    costs two empty-join passes over the reused shuffle output."""
    planes = random_hyperplanes(dim, n_planes, seed)
    b = df.select(F.col(id_col), F.col(vec_col),
                  lsh_signature(F.col(vec_col), planes).alias("__bucket"))
    buckets = (b.groupBy("__bucket")
               .agg(F.array_sort(F.collect_list(
                   F.struct(F.col(id_col).alias("i"),
                            F.col(vec_col).alias("v")))).alias("mem"))
               .filter(F.size("mem") >= 2))
    small = buckets.filter(F.size("mem") <= max_bucket)
    mem = F.col("mem")
    pair_arr = F.flatten(F.transform(
        mem, lambda x, i: F.transform(
            F.slice(mem, i + 2, F.size(mem)),
            lambda y: F.struct(x["i"].alias("id_a"), y["i"].alias("id_b"),
                               x["v"].alias("va"), y["v"].alias("vb")))))
    small_pairs = (small.select(F.explode(pair_arr).alias("p"))
                   .select("p.id_a", "p.id_b", "p.va", "p.vb"))
    # hot-bucket lane: explode members back to rows, self-join within
    # the bucket on position order (mem is sorted by id, so pos_a <
    # pos_b IS id_a < id_b) — the join spills where the array could not
    hot = (buckets.filter(F.size("mem") > max_bucket)
           .select("__bucket", F.posexplode("mem").alias("__pos", "__m")))
    ha, hb = hot.alias("ha"), hot.alias("hb")
    hot_pairs = (ha.join(hb, (F.col("ha.__bucket") == F.col("hb.__bucket"))
                         & (F.col("ha.__pos") < F.col("hb.__pos")))
                 .select(F.col("ha.__m.i").alias("id_a"),
                         F.col("hb.__m.i").alias("id_b"),
                         F.col("ha.__m.v").alias("va"),
                         F.col("hb.__m.v").alias("vb")))
    pairs = (small_pairs.unionByName(hot_pairs)
             .select("id_a", "id_b",
                     (_dot(F.col("va"), F.col("vb")) /
                      (_norm(F.col("va")) *
                       _norm(F.col("vb")))).alias("cos")))
    return (pairs.filter(F.col("cos") >= threshold)
                 .select("id_a", "id_b", F.round("cos", 6).alias("cos")))


def dimension_means(df: DataFrame, vec_col: str,
                    dim: int) -> DataFrame:
    """Per-dimension mean of an embedding column (the centroid — the
    building block of mean-pooling, recentering, and drift monitoring).

    posexplode -> groupBy(dim) with map-side partial aggregation: the
    shuffle carries one partial (sum, count) pair per (partition, dim),
    so cost scales with the scan, not with rows x dims. Sums run over
    DECIMAL(20,10) so the result is order-independent (a double sum
    would differ between engines/partitionings in the low bits)."""
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "v"))
    return (exploded
            .groupBy("dim")
            .agg(F.round((F.sum(F.col("v").cast("decimal(20,10)"))
                          / F.count(F.lit(1))).cast("double"), 8)
                 .alias("mean_v"))
            .filter(F.col("dim") < dim))


# ---------------------------------------------------------------------------
# Product quantization (r7)
# ---------------------------------------------------------------------------

def _check_pq(dim: int, m: int, n_codes: int) -> None:
    if m < 1 or dim % m != 0:
        raise ValueError(f"m must divide dim: dim={dim}, m={m}")
    if n_codes < 2:
        raise ValueError(f"n_codes must be >= 2, got {n_codes}")


def _sq_l2(a, b) -> F.Column:
    """Left-associated squared-L2 between two float arrays, each
    element double-cast BEFORE subtracting (the _dot determinism
    contract: float32 math would diverge from the double-typed
    oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y:
                   (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0), lambda acc, v: acc + v)


def _pq_codebook(df: DataFrame, vec_col: str, id_col: str,
                 dim: int, m: int, n_codes: int) -> DataFrame:
    """(j, cid, cs): subspace j's codeword cid is the j-th slice of
    the cid-th lowest-id vector — deterministic, so any SQL engine
    rebuilds the identical codebook (the ivf_fixed_topk centroid
    convention). A k-means-trained codebook drops in by swapping this
    frame; the encode/ADC plumbing doesn't care where codewords come
    from."""
    sub = dim // m
    cent = (df.orderBy(id_col).limit(n_codes)
            .select(F.col(id_col).alias("cid"),
                    F.col(vec_col).alias("cvec")))
    return (cent.select("cid", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.slice("cvec", j * sub + 1, sub).alias("cs"))
        for j in range(m)])).alias("s"))
        .select(F.col("s.j").alias("j"), "cid",
                F.col("s.cs").alias("cs")))


def pq_encode(df: DataFrame, vec_col: str, id_col: str, dim: int,
              m: int = 4, n_codes: int = 8,
              codebook: Optional[DataFrame] = None) -> DataFrame:
    """Product-quantization encode: split each vector into ``m``
    subvectors, assign each to its nearest codeword (squared L2,
    ties -> lowest cid). Returns long-form (id, j, code) — m rows per
    vector, m*log2(n_codes)-ish bits of payload instead of dim*32
    (Jegou et al. 2011, "Product quantization for nearest neighbor
    search" — the compressed-corpus layout behind billion-scale ANN).

    Plan: one explode (m rows/vector) x broadcast codebook join ->
    min_by groupBy that collapses MAP-SIDE, so the single shuffle
    carries one pre-reduced row per (vector, subspace). 100 TB: the
    code table is what you persist; raw vectors are scanned once."""
    _check_pq(dim, m, n_codes)
    sub = dim // m
    # pass a prebuilt (j, cid, cs) frame to reuse one codebook across
    # encode + ADC (each default build is a corpus orderBy-limit scan —
    # review r7) or to swap in k-means-trained codewords
    cb = codebook if codebook is not None else \
        _pq_codebook(df, vec_col, id_col, dim, m, n_codes)
    vex = (df.select(F.col(id_col), F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 F.slice(vec_col, j * sub + 1, sub).alias("xs"))
        for j in range(m)])).alias("s"))
        .select(id_col, F.col("s.j").alias("j"),
                F.col("s.xs").alias("xs")))
    return (vex.join(F.broadcast(cb), "j")
            .select(id_col, "j", "cid",
                    _sq_l2(F.col("xs"), F.col("cs")).alias("_d2"))
            .groupBy(id_col, "j")
            .agg(F.min_by("cid", F.struct(F.col("_d2").alias("d"),
                                          F.col("cid").alias("c")))
                 .alias("code")))


def pq_adc_topk(df: DataFrame, vec_col: str, query: Sequence[float],
                k: int = 10, id_col: str = "vec_id", dim: int = 64,
                m: int = 4, n_codes: int = 8,
                round_digits: Optional[int] = 6) -> DataFrame:
    """Approximate top-k by ASYMMETRIC distance computation: the query
    stays full-precision, each corpus vector is represented by its PQ
    codes, and dist(q, x) ~= sum_j qtab[j, code_j(x)] where qtab maps
    every (subspace, codeword) to its squared-L2 from the query's
    slice — the m*n_codes lookup table that makes PQ search O(m) per
    vector regardless of dim. Returns (id, codes, adc) ascending by
    (adc, id); ``codes`` is the dash-joined code string (recorded-shape
    contract: no array columns).

    Determinism: the ADC total folds the m per-subspace distances in
    FIXED j order (d0+d1+...), never a float SUM whose accumulation
    order the engine picks (memory note: float agg order); the
    groupBy pivoting codes to columns moves exact integers only.

    100 TB: qtab is a broadcast of m*n_codes rows; the scan side is
    the 32x-compressed code table; one map-side-combined groupBy plus
    a global top-k."""
    _check_pq(dim, m, n_codes)
    if len(query) != dim:
        raise ValueError(f"query dim {len(query)} != {dim}")
    sub = dim // m
    # ONE codebook for encode + qtab, materialized (m*n_codes tiny
    # rows): both consumers would otherwise re-run the corpus
    # orderBy-limit scan it derives from (the k>=2-reference rule on a
    # frame whose lineage is expensive but whose content is bytes)
    cb = _pq_codebook(df, vec_col, id_col, dim, m, n_codes) \
        .localCheckpoint(eager=False)
    codes = pq_encode(df, vec_col, id_col, dim, m, n_codes,
                      codebook=cb)
    # qtab: squared-L2 from the query's j-th slice to each codeword.
    # The query slice must align with the codeword's subspace, so each
    # j contributes its own literal array via a union of m tiny
    # projections over the (already tiny) codebook frame.
    qparts = []
    for j in range(m):
        qlit = F.array(*[F.lit(float(v))
                         for v in query[j * sub:(j + 1) * sub]])
        qparts.append(cb.filter(F.col("j") == j)
                      .select("j", "cid",
                              _sq_l2(F.col("cs"), qlit).alias("qd")))
    qtab = qparts[0]
    for part in qparts[1:]:
        qtab = qtab.unionAll(part)
    joined = codes.join(F.broadcast(qtab),
                        (codes["j"] == qtab["j"])
                        & (codes["code"] == qtab["cid"]))
    per_j = joined.groupBy(id_col).agg(
        *[F.max(F.when(codes["j"] == j, F.col("qd"))).alias(f"_d{j}")
          for j in range(m)],
        *[F.max(F.when(codes["j"] == j, F.col("code")))
          .alias(f"_c{j}") for j in range(m)])
    adc = F.col("_d0")
    for j in range(1, m):
        adc = adc + F.col(f"_d{j}")
    if round_digits is not None:
        adc = F.round(adc, round_digits)
    return (per_j.select(
        F.col(id_col),
        F.concat_ws("-", *[F.col(f"_c{j}").cast("string")
                           for j in range(m)]).alias("codes"),
        adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col(id_col))
        .limit(k))
