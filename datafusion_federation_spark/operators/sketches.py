"""Deterministic cardinality sketches: KMV (k-minimum-values) distinct
counting and sketch set algebra, exactly reproducible across engines.

Why not Spark's ``approx_count_distinct`` (HLL++): it is the
production fast path, but its register layout is engine-private — no
other engine reproduces its estimate, so it can never be
oracle-checked. KMV over an md5 content hash is the portable twin: the
k smallest hash values of a set are a pure function of the set, so two
engines that agree on md5 agree on the sketch bit for bit (same
relationship as the xxhash64/md5 dedup twins, operators/dedup.py).
The portable-HLL section below (r7) applies the same determinism
contract to HLL's fixed-size register array — see its block comment
for when each sketch wins.

Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
data stream"): with U(1)..U(n) the order statistics of n i.i.d.
uniforms, E[U(k)] = k/(n+1), so n ≈ (k-1)/U(k) is the (unbiased,
method-of-moments) estimate from the k-th smallest normalized hash.
Relative standard error ~ 1/sqrt(k-2): k=128 -> ~9%, k=1024 -> ~3%.

Distributed shape: DISTINCT on (group, hash) — the only wide op, and
map-side combined — then a per-group sort-topk window (the shared
``_topk_hashes``). The sketch is MERGEABLE by construction (union of
sets -> union of hash sets -> same k smallest); ``kmv_partials``/
``kmv_merge`` expose the two-level form for pre-aggregated storage
(sketch per partition/day, merge at query time) with a property test
pinning merge == whole-set.

100 TB: the distinct shuffles only (group, 16-byte hash); the window
sorts each group's ALREADY-DISTINCT hashes. For billion-cardinality
groups prefer the partials form: cap each partial at k rows before they
meet, so no group ever materializes its full distinct set in one place.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: 15 hex digits = 60 bits: fits a signed 64-bit int in BOTH engines
#: (DuckDB reads it via a 0x literal cast) and converts to double with
#: one IEEE round-to-nearest — identical everywhere.
_HEX_DIGITS = 15
_HEX_SPACE = float(1 << (4 * _HEX_DIGITS))


def kmv_hash(key: Column, salt: str = "kmv") -> Column:
    """Purpose-salted md5 hex of the key — lexicographic order on the
    hex string IS numeric order on the hash value, so min-k can stay on
    strings end to end (no conversion until the final estimate)."""
    return F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))


def _hash_frac(hex_col: Column) -> Column:
    """Leading 60 bits of the hex hash as a uniform double in (0, 1)."""
    return (F.conv(F.substring(hex_col, 1, _HEX_DIGITS), 16, 10)
            .cast("double") / F.lit(_HEX_SPACE))


def kmv_estimate(count_col: Column, kth_hex: Column, k: int) -> Column:
    """(k-1)/U(k) when the group reached k hashes, else the exact count
    (fewer than k distinct values means the sketch IS the set)."""
    return F.when(count_col < k, count_col.cast("double")) \
            .otherwise(F.lit(float(k - 1)) / _hash_frac(kth_hex))


def _check_k(k: int) -> None:
    if k < 3:
        raise ValueError(f"k must be >= 3 for a finite-variance "
                         f"estimate, got {k}")


def _distinct_hashes(df: DataFrame, key: str,
                     groups: Sequence[str]) -> DataFrame:
    # NULL keys hash to NULL (concat with NULL) and are DROPPED: NULL
    # is not a distinct value (COUNT(DISTINCT x) ignores it in every
    # engine), and a NULL hash would land in engine-dependent bottom-k
    # slots (Spark windows order NULL first, DuckDB last — review r6)
    return (df.select(*groups, kmv_hash(F.col(key)).alias("_h"))
              .filter(F.col("_h").isNotNull())
              .distinct())


def _topk_hashes(hashes: DataFrame, groups: Sequence[str],
                 k: int) -> DataFrame:
    """Keep each group's k smallest ``_h`` rows (all other columns ride
    along) — the one top-k block every operator here shares."""
    w = W.partitionBy(*groups).orderBy("_h")
    return (hashes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k))


def _estimate_frame(topk: DataFrame, groups: Sequence[str], k: int,
                    round_digits: int) -> DataFrame:
    agg = topk.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("_h").alias("_kth"))
    return agg.select(
        *groups, F.col("n_kept"),
        F.round(kmv_estimate(F.col("n_kept"), F.col("_kth"), k),
                round_digits).alias("est"))


def kmv_distinct(df: DataFrame, key: str, group_by: Sequence[str],
                 k: int = 128, round_digits: int = 2) -> DataFrame:
    """Per-group distinct-count estimate of ``key``: group columns +
    ``n_kept`` (hashes retained, = min(k, true distinct)) + ``est``.

    One DISTINCT + one per-group window topk; deterministic for a given
    (corpus, k, salt) regardless of partition layout.
    """
    _check_k(k)
    groups = list(group_by)
    topk = _topk_hashes(_distinct_hashes(df, key, groups), groups, k)
    return _estimate_frame(topk, groups, k, round_digits)


def kmv_partials(df: DataFrame, key: str, group_by: Sequence[str],
                 k: int = 128) -> DataFrame:
    """Mergeable sketch rows: group columns + ``kmv`` (ascending array
    of at most k hash hexes). Store these per shard/day; ``kmv_merge``
    combines them without touching the raw data again.

    Uses sort-window topk per group like ``kmv_distinct`` (NOT
    collect_set -> slice, which would materialize a group's whole
    distinct set in one aggregation buffer)."""
    groups = list(group_by)
    topk = _topk_hashes(_distinct_hashes(df, key, groups), groups, k)
    return (topk.groupBy(*groups)
            .agg(F.array_sort(F.collect_list("_h")).alias("kmv")))


def kmv_merge(partials: DataFrame, group_by: Sequence[str],
              k: int = 128, round_digits: int = 2) -> DataFrame:
    """Merge ``kmv_partials`` rows sharing the same group: union the
    hash arrays, dedupe, keep the k smallest, re-estimate. Exactly
    equals ``kmv_distinct`` over the concatenated raw data (pinned by
    test_sketches.py's merge property)."""
    groups = list(group_by)
    exploded = partials.select(
        *groups, F.explode("kmv").alias("_h")).distinct()
    return _estimate_frame(_topk_hashes(exploded, groups, k),
                           groups, k, round_digits)


def kmv_set_estimates(partials_a: DataFrame, partials_b: DataFrame,
                      group_by: Sequence[str], k: int = 128,
                      round_digits: int = 2) -> DataFrame:
    """Union / intersection cardinality estimates from two KMV sketches
    sharing the same groups — WITHOUT touching the raw data again (the
    sketch-algebra payoff: overlap questions between corpora answered
    from per-corpus sketch rows).

    Theory (Beyer et al. 2007, "On synopses for distinct-value
    estimation under multiset operations"): the k smallest hashes of
    A ∪ B are computable from the two sketches alone; |A ∪ B| ≈
    (k-1)/U(k) as usual, and the fraction ρ of those k that appear in
    BOTH sketches estimates the Jaccard similarity, giving
    |A ∩ B| ≈ ρ · |A ∪ B|. Membership testing against the sketches is
    exact for every hash at-or-below the union's k-th minimum, which is
    ≤ both sides' own k-th minimums.

    Groups present in only ONE input get NULL estimates (no sketch of
    the other side — semantically unknown, not zero). The presence
    flags are computed over the FULL merged hash set, not the top-k
    slice: with skewed cardinalities the smaller side's hashes can all
    rank above the union's k-th minimum, which must not be mistaken for
    the side being absent (review r5 finding, reproduced: B ⊆ A with
    |B|=1, k=4 returned NULL instead of estimates). Estimates are exact
    whenever the union fits below k (the sketch IS the union).
    """
    groups = list(group_by)
    ea = partials_a.select(*groups, F.explode("kmv").alias("_h"),
                           F.lit(1).alias("_a"), F.lit(0).alias("_b"))
    eb = partials_b.select(*groups, F.explode("kmv").alias("_h"),
                           F.lit(0).alias("_a"), F.lit(1).alias("_b"))
    u = (ea.unionByName(eb)
         .groupBy(*groups, "_h")
         .agg(F.max("_a").alias("_a"), F.max("_b").alias("_b")))
    # group-wide presence BEFORE the top-k cut; the unordered window
    # shares the top-k window's partitioning, so no extra shuffle
    wg = W.partitionBy(*groups)
    u = (u.withColumn("_any_a", F.max("_a").over(wg))
          .withColumn("_any_b", F.max("_b").over(wg)))
    topk = _topk_hashes(u, groups, k)
    agg = topk.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_h").alias("_kth"),
        F.sum(F.col("_a") * F.col("_b")).alias("_both"),
        F.max("_any_a").alias("_any_a"), F.max("_any_b").alias("_any_b"))
    union_est = kmv_estimate(F.col("n_kept"), F.col("_kth"), k)
    jac = F.col("_both").cast("double") / F.col("n_kept").cast("double")
    both_sides = (F.col("_any_a") == 1) & (F.col("_any_b") == 1)
    return agg.select(
        *groups,
        F.when(both_sides, F.round(union_est, round_digits))
         .alias("union_est"),
        F.when(both_sides, F.round(jac * union_est, round_digits))
         .alias("intersect_est"))


def cm_hash_bucket(key: Column, row, width: int,
                   salt: str = "cm") -> Column:
    """Bucket of ``key`` in CM row ``row`` (an int or the exploded row
    Column — the salt is concatenated dynamically, so one expression
    serves both): 60 md5 bits mod width, engine-portable like every
    hash here and byte-identical to the d53 oracle's
    ``concat('cm:', d, ':', w)``."""
    row_col = F.lit(row) if isinstance(row, int) else row
    hex15 = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), row_col.cast("string"),
                       F.lit(":"), key.cast("string"))),
        1, _HEX_DIGITS)
    return F.pmod(F.conv(hex15, 16, 10).cast("bigint"), F.lit(width))


def cm_sketch(df: DataFrame, key: str, depth: int = 4,
              width: int = 512, salt: str = "cm",
              weight_col: str | None = None) -> DataFrame:
    """Count-min sketch of the FREQUENCY distribution of ``key``:
    ``depth`` independent hash rows of ``width`` counters, stored as
    (row, bucket, cnt) rows — depth*width counters regardless of
    cardinality, the fixed-size summary for heavy-hitter queries over
    streams/shards.

    Deterministic and MERGEABLE BY ADDITION: counters are plain sums,
    so summing two sketches' (row, bucket) cells IS the sketch of the
    concatenated multisets — exactly, not approximately (pinned in
    tests). Estimates (``cm_estimate``) are upper bounds: collisions
    only ever inflate a counter, never deflate; error ≤ 2N/width with
    probability 1 - 2^-depth (Cormode & Muthukrishnan 2005).

    One explode (xdepth) + one groupBy — map-side combined, at most
    depth*width result rows however big the corpus.

    ``weight_col``: when the caller already holds PRE-AGGREGATED
    (key, count) rows, pass the count column and each key is hashed
    ONCE per row instead of once per occurrence — the counters are
    plain sums, so sketch(counts) == sketch(raw stream) exactly (r13
    optimization round, guide §2.4 partial aggregation: d53 already
    computes the per-token counts for its heavy-hitter ranking, and
    reusing them cuts the md5 evaluations from depth x N_tokens to
    depth x vocabulary).
    """
    _check_cm(depth, width)
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)]))
    cols = [F.col(key).alias("_k")]
    if weight_col is not None:
        cols.append(F.col(weight_col).alias("_w"))
    e = df.select(*cols, rows.alias("row"))
    e = e.withColumn("bucket", cm_hash_bucket(
        F.col("_k"), F.col("row"), width, salt))
    agg = (F.count(F.lit(1)) if weight_col is None
           else F.sum("_w"))
    return (e.groupBy("row", "bucket")
            .agg(agg.alias("cnt")))


def _check_cm(depth: int, width: int) -> None:
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; "
                         f"got {depth}x{width}")


def cm_estimate(sketch: DataFrame, probes: DataFrame, key: str,
                depth: int = 4, width: int = 512,
                salt: str = "cm") -> DataFrame:
    """Point-query the sketch: for each probe key, the MIN over rows of
    its bucket's counter — the classic CM upper-bound estimate.
    ``depth``/``width``/``salt`` must match the sketch's build
    parameters (they are not stored in the sketch rows; a mismatch
    produces garbage bounds, not an error)."""
    _check_cm(depth, width)
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)]))
    p = probes.select(F.col(key), rows.alias("row"))
    p = p.withColumn("bucket", cm_hash_bucket(
        F.col(key), F.col("row"), width, salt))
    j = p.join(sketch, ["row", "bucket"], "left")
    return (j.groupBy(key)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("bigint").alias("est")))


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------
#
# The classic shuffle-reduction move for 100 TB fact-dim joins (Bloom
# 1970): build an m-bit / kh-hash membership filter over the dim side's
# join keys, broadcast it, and drop fact rows whose key provably cannot
# match BEFORE the join's Exchange. Spark has an engine-internal analog
# (spark.sql.optimizer.runtime.bloomFilter.*, injected only for shuffle
# joins it can see through); this is the EXPLICIT, cross-source version
# the federation setting needs — the dim side may be a remote SQL
# provider (sources/provider.py) whose keys arrive as a federated scan,
# while the fact side is local parquet: the filter is the only thing
# that crosses, m/8 bytes however many rows the dim has.
#
# Distributed shape: the build explodes each dim key to kh bit
# positions, then ONE map-side-combined groupBy(word) bit_or's them
# into <= m/64 (word, mask) rows — the only wide op, bounded by the
# filter size, not the data. The probe packs those rows into a 1-row
# map column (driver never sees it), broadcasts it, and tests kh bits
# per fact row in pure codegen (try_element_at + shift — no UDF). A
# fact row passes only if ALL kh bits are set; false positives are
# possible (fill^kh), false NEGATIVES are not (property-tested), so
# pruned-then-joined results are EXACTLY the unpruned join's — which is
# what makes the operator oracle-checkable (d62).
#
# When to prefer it over a plain broadcast join: an exact broadcast
# hash join ships ~8 bytes per distinct dim key; at 10^8 keys that is
# ~800 MB per executor, but a 2^27-bit bloom is 16 MB at ~1% false
# positives. Size m ~ 10 bits per expected distinct key for fpp ~1%
# with kh=5 (kh_opt = m/n * ln 2).

#: probe-side helper columns; guarded like asof_join's reserved names
_BLOOM_RESERVED = ("_bloom_words",)


def _check_bloom(m_bits: int, kh: int) -> None:
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64; "
                         f"got {m_bits}")
    if kh < 1 or kh > 16:
        raise ValueError(f"need 1 <= kh <= 16 hash functions; got {kh}")


def _bloom_positions(key: Column, m_bits: int, kh: int,
                     salt: str) -> list:
    """kh independent bit positions in [0, m_bits): xxhash64 seeded by
    a per-function salt literal (deterministic per VALUE, so the filter
    is partition-layout-invariant; xxhash64 is fine here — the filter
    never crosses engines, only prunes rows that an exact join then
    verifies)."""
    return [F.pmod(F.xxhash64(F.lit(f"{salt}:{i}"), key), F.lit(m_bits))
            for i in range(kh)]


def bloom_bits(df: DataFrame, key: str, m_bits: int = 1 << 22,
               kh: int = 5, salt: str = "bloom") -> DataFrame:
    """Build the filter: <= m_bits/64 rows of (word int, mask bigint),
    the set bits of a Bloom filter over ``df[key]``. NULL keys are
    excluded by definition (a NULL never equi-matches). The groupBy is
    map-side combined, so each task emits at most m/64 rows no matter
    how many keys it saw."""
    _check_bloom(m_bits, kh)
    kc = F.col(key)
    pos = F.explode(F.array(
        *_bloom_positions(kc, m_bits, kh, salt))).alias("pos")
    e = df.filter(kc.isNotNull()).select(pos)
    return (e.groupBy(F.shiftright("pos", 6).cast("int").alias("word"))
            .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                        "CAST(pos % 64 AS INT)))").alias("mask")))


def bloom_prune(df: DataFrame, key: str, bits: DataFrame,
                m_bits: int = 1 << 22, kh: int = 5,
                salt: str = "bloom") -> DataFrame:
    """Keep only rows whose ``key`` MIGHT be in the filter (same
    m_bits/kh/salt as the build — a mismatch silently prunes wrong, as
    with cm_estimate). The bits pack into a single map literal via a
    1-row aggregate (bounded by m/8 bytes, independent of data volume)
    that broadcasts to every task; the kh probes run in whole-stage
    codegen. NULL keys are pruned (they cannot equi-match). An EMPTY
    build side yields an empty map -> everything pruned, matching the
    empty-dim join."""
    _check_bloom(m_bits, kh)
    clash = [c for c in df.columns
             if c in _BLOOM_RESERVED or c.startswith("_bp")]
    if clash:
        raise ValueError(
            f"input uses bloom_prune's reserved column names {clash}")
    one = bits.agg(F.map_from_entries(F.collect_list(
        F.struct("word", "mask"))).alias("_bloom_words"))
    out = df.join(F.broadcast(one))
    kc = F.col(key)
    cond = kc.isNotNull()
    helpers = []
    for i, p in enumerate(_bloom_positions(kc, m_bits, kh, salt)):
        h = f"_bp{i}"
        helpers.append(h)
        out = out.withColumn(h, p)
        cond = cond & F.expr(
            f"(coalesce(try_element_at(_bloom_words, "
            f"CAST({h} DIV 64 AS INT)), CAST(0 AS BIGINT)) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({h} % 64 AS INT))) != 0")
    return out.filter(cond).drop("_bloom_words", *helpers)


def bloom_semi_join(fact: DataFrame, dim: DataFrame, fact_key: str,
                    dim_key: str, m_bits: int = 1 << 22, kh: int = 5,
                    salt: str = "bloom") -> DataFrame:
    """fact LEFT SEMI JOIN dim with a Bloom pre-prune: exact-equal to
    the plain semi join (the verify join removes every false positive),
    but only the filter-surviving fraction of the fact reaches the
    join's Exchange. The dim side is read twice (bits + verify) — at
    scale cache or checkpoint it if it is itself expensive."""
    pruned = bloom_prune(fact, fact_key, bloom_bits(dim, dim_key,
                                                    m_bits, kh, salt),
                         m_bits, kh, salt)
    keys = dim.select(dim_key).distinct()
    return pruned.join(keys, on=pruned[fact_key] == keys[dim_key],
                       how="left_semi")


# ---------------------------------------------------------------------------
# Portable HyperLogLog (md5 registers)
# ---------------------------------------------------------------------------
# Spark's approx_count_distinct is HLL++ with engine-private registers
# (the header's KMV rationale) — but HLL itself is portable when the
# hash is: with registers derived from the same md5-based 60-bit hash
# both engines compute IDENTICAL register arrays, so the sketch is
# oracle-checkable bit for bit, like the KMV/md5 twins. Where KMV keeps
# k 16-byte hashes per group (k=128 -> 2 KB), HLL keeps 2^p 1-byte
# registers (p=6 -> 64 B) and merges by elementwise max — the shape
# production systems persist per shard/day at 100 TB. Flajolet et al.
# 2007 ("HyperLogLog: the analysis of a near-optimal cardinality
# estimation algorithm"); relative standard error ~= 1.04/sqrt(m).
#
# Cross-engine determinism contract (the whole point of this variant):
# - registers are integers (bucket = top p bits of the 60-bit hash,
#   rho = leading-zero count of the remainder via length(bin(w)) —
#   NO libm anywhere, see memory note on log in oracle-gated scores);
# - the harmonic denominator is summed in FIXED-POINT BIGINT
#   (sum of 2^(Rmax-rho), order-independent integer addition — a
#   double sum's rounding would depend on partition order);
# - the raw estimate is ONE literal-constant division C/S, and IEEE
#   division is correctly rounded, so even the double output is
#   bit-identical across engines. The optional small-range linear
#   counting correction (m*ln(m/V)) IS libm-dependent — it is applied
#   only when correct_small=True and never in recorded oracle rows.

#: alpha_m bias constants (Flajolet et al. 2007, Fig. 3)
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _check_hll(p: int) -> None:
    # p <= 12 keeps the fixed-point sum under 2^63: worst case is all
    # m = 2^p registers absent, m * 2^(60-p+1) = 2^62 at p = 1, and
    # monotonically smaller after; p >= 4 keeps the alpha approximation
    # in its published regime.
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12], got {p}")


def _hll_alpha(m: int) -> float:
    return _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_register_rows(df: DataFrame, key: str,
                      group_by: Sequence[str], p: int = 6,
                      salt: str = "hll") -> DataFrame:
    """Row-level (groups..., idx, rho) projection — the pure JVM-side
    register function shared by the batch aggregate below and the
    streaming operator (streaming/stateful.streaming_hll), which must
    hash IDENTICALLY so stream state finalizes equal to the batch
    sketch. NULL keys drop (COUNT(DISTINCT) semantics, same as KMV)."""
    _check_hll(p)
    groups = list(group_by)
    bits = 4 * _HEX_DIGITS - p          # remainder width
    h = (F.conv(F.substring(kmv_hash(F.col(key), salt), 1, _HEX_DIGITS),
                16, 10).cast("long"))
    w = F.col("_h") % F.lit(1 << bits)
    # rho = leading zeros of w within `bits` + 1; length(bin(w)) is the
    # highest-set-bit position, so rho = bits - length + 1 (w = 0 means
    # ALL zeros: bits + 1). Integer-exact — no log anywhere.
    rho = F.when(w == 0, F.lit(bits + 1)) \
           .otherwise(F.lit(bits + 1) - F.length(F.bin(w)))
    return (df.select(*groups, h.alias("_h"))
              .filter(F.col("_h").isNotNull())
              .select(*groups, F.shiftright("_h", bits).alias("idx"),
                      rho.alias("rho")))


def hll_registers(df: DataFrame, key: str, group_by: Sequence[str],
                  p: int = 6, salt: str = "hll") -> DataFrame:
    """Per-group SET registers: group columns + ``idx`` (0..2^p-1) +
    ``rho`` (max leading-zero rank seen in that bucket). Registers a
    group never touched are absent rows (rho = 0 by convention) — the
    frame is the MERGEABLE partial: union register frames from any
    shard split and ``hll_merge`` re-maxes them.

    Distributed shape: one groupBy((groups, idx), max) — map-side
    combined, and the shuffle carries at most groups x 2^p tiny rows
    no matter how many billions of input rows (vs KMV's DISTINCT whose
    shuffle scales with the number of distinct values)."""
    groups = list(group_by)
    return (hll_register_rows(df, key, groups, p, salt)
            .groupBy(*groups, "idx")
            .agg(F.max("rho").alias("rho")))


def hll_merge(registers: DataFrame, group_by: Sequence[str],
              p: int = 6) -> DataFrame:
    """Merge register frames (elementwise max per (group, idx)) —
    union of sketches == sketch of union, exactly."""
    _check_hll(p)
    groups = list(group_by)
    return (registers.groupBy(*groups, "idx")
            .agg(F.max("rho").alias("rho")))


def hll_estimate(registers: DataFrame, group_by: Sequence[str],
                 p: int = 6, round_digits: int = 3,
                 correct_small: bool = False) -> DataFrame:
    """Estimate from a register frame: group columns + ``n_regs``
    (registers set) + ``s_fixed`` (the exact fixed-point harmonic
    denominator, BIGINT) + ``est``.

    est = alpha_m * m^2 * 2^Rmax / s_fixed — the constant C is folded
    in Python (one float product), so both engines evaluate a single
    division of a shared literal by an identical integer: bit-equal.
    ``correct_small=True`` additionally applies the standard linear
    counting correction m*ln(m/V) when est <= 2.5m and empty registers
    remain — more accurate below ~2.5m distinct, but libm-dependent,
    so leave it OFF in cross-engine-recorded outputs and pick a
    cardinality regime where raw HLL applies (n > 2.5m)."""
    _check_hll(p)
    groups = list(group_by)
    m = 1 << p
    rmax = 4 * _HEX_DIGITS - p + 1
    c = _hll_alpha(m) * float(m * m * (1 << rmax))
    agg = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_regs"),
        # expr form: the Python shiftleft() helper takes only a literal
        # bit count, but the SQL function shifts by a column fine
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {rmax} - rho)"))
         .alias("_s_set"))
    s_fixed = ((F.lit(m) - F.col("n_regs")).cast("long")
               * F.lit(1 << rmax) + F.col("_s_set"))
    out = agg.select(*groups, F.col("n_regs").cast("long").alias("n_regs"),
                     s_fixed.alias("s_fixed"))
    raw = F.lit(c) / F.col("s_fixed").cast("double")
    if correct_small:
        v = (F.lit(m) - F.col("n_regs")).cast("double")
        lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
        raw = F.when((raw <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(raw)
    return out.withColumn("est", F.round(raw, round_digits))


def hll_distinct(df: DataFrame, key: str, group_by: Sequence[str],
                 p: int = 6, round_digits: int = 3,
                 correct_small: bool = False,
                 salt: str = "hll") -> DataFrame:
    """One-shot per-group HLL distinct count (registers + estimate)."""
    return hll_estimate(hll_registers(df, key, group_by, p, salt),
                        group_by, p, round_digits, correct_small)


# ===========================================================================
# Mergeable histogram quantiles
# ===========================================================================
# Exact per-group percentiles (d22's percentile/quantile_cont) need every
# group's values in one place — a full sort at 100 TB. The scale path is
# the classic fixed-bin histogram sketch: per-partition bin counts are
# map-side combined, the ONLY shuffle carries at most groups x n_bins
# rows regardless of input size, and partials (per shard/day) merge by
# plain addition. The estimator is deterministic arithmetic on integer
# counts plus ONE double division and one multiply-add — no libm, no
# order-dependent float sums — so DuckDB replays it bit for bit
# (the same determinism contract as the portable HLL above).
#
# Accuracy: the estimate lands within one bin width of the true value
# whenever the true quantile falls in [lo, hi); values outside clamp to
# the edge bins, so edge-bin estimates degrade to the range bound
# (callers pick lo/hi from domain knowledge or a cheap min/max pass).


def _check_hist(lo: float, hi: float, n_bins: int) -> None:
    if not (hi > lo):
        raise ValueError(f"hi must exceed lo, got [{lo}, {hi})")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")


def hist_bin(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """Fixed-width bin id in [0, n_bins): floor((v - lo)/binw) clamped to
    the edge bins. NULL and NaN values map to NULL (dropped by
    hist_counts — every engine's quantile ignores NULLs, and no bin is
    meaningful for NaN; without the explicit when(), the double-space
    clamp would silently fold NaN into bin 0 via least(), skewing low
    quantiles — review r7). Clamping happens in DOUBLE space BEFORE
    the int cast so +/-Infinity lands in an edge bin instead of
    raising under ANSI (Spark 4 default: non-finite -> int casts
    error)."""
    binw = (hi - lo) / n_bins
    v = value.cast("double")
    raw = F.floor((v - F.lit(lo)) / F.lit(binw))
    clamped = F.least(F.lit(float(n_bins - 1)),
                      F.greatest(F.lit(0.0), raw)).cast("int")
    return F.when(F.isnan(v), F.lit(None).cast("int")).otherwise(clamped)


def hist_counts(df: DataFrame, value_col: str, group_by: Sequence[str],
                lo: float, hi: float, n_bins: int = 64) -> DataFrame:
    """Per-(group, bin) row counts — the sketch state. Mergeable by
    summing ``cnt`` (``hist_merge``); compute per shard (append the
    shard column to ``group_by``) for pre-aggregated storage."""
    _check_hist(lo, hi, n_bins)
    groups = list(group_by)
    binc = hist_bin(F.col(value_col), lo, hi, n_bins)
    # NaN drops like NULL (hist_bin maps both to NULL; the filter
    # keeps the scan-side pushdown explicit)
    v = F.col(value_col).cast("double")
    return (df.filter(v.isNotNull() & ~F.isnan(v))
              .select(*groups, binc.alias("bin"))
              .groupBy(*groups, "bin")
              .agg(F.count(F.lit(1)).alias("cnt")))


def hist_merge(partials: DataFrame,
               group_by: Sequence[str]) -> DataFrame:
    """Merge shard-level sketches down to ``group_by``: counts add."""
    groups = list(group_by)
    return (partials.groupBy(*groups, "bin")
            .agg(F.sum("cnt").alias("cnt")))


def hist_quantiles(counts: DataFrame, group_by: Sequence[str],
                   qs: Sequence[Tuple[str, float]],
                   lo: float, hi: float, n_bins: int = 64,
                   round_digits: int = 4) -> DataFrame:
    """Quantile estimates from sketch state: for each (label, q) in
    ``qs``, the rank-ceil(q*n) value under within-bin linear
    interpolation — group columns + ``qlabel`` + ``n`` + ``est``.

    Shape: one cumulative-sum window over each group's <= n_bins count
    rows (same exchange as the grand-total window), a broadcast join
    against the literal quantile list, then pure row-local arithmetic.
    Determinism: rank/cum/cnt stay BIGINT; the only floats are one
    division, one add, one multiply against shared literals.
    """
    _check_hist(lo, hi, n_bins)
    for lab, qv in qs:
        if not (0.0 < qv <= 1.0):
            # q=0 -> rank 0 matches NO bin and the label silently
            # vanishes from the output; fail loudly instead
            raise ValueError(f"quantile {lab!r}={qv} outside (0, 1]")
    groups = list(group_by)
    binw = (hi - lo) / n_bins
    spark = counts.sparkSession
    qdf = spark.createDataFrame([(lab, float(qv)) for lab, qv in qs],
                                "qlabel string, q double")
    wcum = W.partitionBy(*groups).orderBy("bin") \
            .rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy(*groups)
    cum = (counts
           .withColumn("_cum", F.sum("cnt").over(wcum))
           .withColumn("n", F.sum("cnt").over(wall)))
    j = cum.join(F.broadcast(qdf), how="cross")
    rank = F.ceil(F.col("q") * F.col("n").cast("double")).cast("long")
    hit = (j.withColumn("_rank", rank)
            .filter((F.col("_cum") >= F.col("_rank"))
                    & (F.col("_cum") - F.col("cnt") < F.col("_rank"))))
    frac = ((F.col("_rank") - (F.col("_cum") - F.col("cnt")))
            .cast("double") / F.col("cnt").cast("double"))
    est = (F.lit(float(lo))
           + F.lit(float(binw)) * (F.col("bin").cast("double") + frac))
    return hit.select(*groups, "qlabel", F.col("n").cast("long").alias("n"),
                      F.round(est, round_digits).alias("est"))


def hist_quantile_frame(df: DataFrame, value_col: str,
                        group_by: Sequence[str],
                        qs: Sequence[Tuple[str, float]],
                        lo: float, hi: float, n_bins: int = 64,
                        round_digits: int = 4) -> DataFrame:
    """One-shot counts + estimates (the partials/merge pair split the
    same two stages across storage)."""
    return hist_quantiles(
        hist_counts(df, value_col, group_by, lo, hi, n_bins),
        group_by, qs, lo, hi, n_bins, round_digits)
