"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windows (windows.py) cover time-bucketed aggregation; these
operators need arbitrary per-key state the built-ins can't express:

- streaming_dedup: exactly-once emission per key across the whole stream
  (the streaming form of exact_dedup — state is one flag per key, so a
  100 TB/day stream holds |distinct keys| booleans in the state store,
  sharded by key like any keyed state).
- running_totals: per-key running count/sum emitted once per micro-batch
  (monoid state: merges associatively, so state size is O(keys), not
  O(events)).

Why not Spark 4's ``transformWithStateInPandas``: probed r6 — the API
is present but its state-server protocol imports ``protobuf``, which
this environment does not ship (driver worker crashes with
"No module named 'protobuf'" during state-schema validation; no
pip-install allowed). applyInPandasWithState is the stateful surface
until the dependency exists; the operators here port mechanically
(ListState/ValueState instead of the GroupState tuple).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(events: DataFrame, key_col: str = "event_id",
                    payload_cols: Tuple[str, ...] = ("event_type", "value")
                    ) -> DataFrame:
    """Emit ONE row per key, drop every later duplicate — across
    micro-batches, not just within one. State: a single seen flag per
    key.

    Within a micro-batch the representative is the payload-wise SMALLEST
    duplicate (like exact_dedup's min-id pick, operators/dedup.py): rows
    arrive in unspecified post-shuffle order, and a failure-recovery
    re-execution of the batch must emit the same row a downstream sink
    may already have consumed."""
    out_schema = T.StructType(
        [events.schema[key_col]] + [events.schema[c] for c in payload_cols])
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            return                       # key already emitted, drop all
        chunks = [pdf[[key_col, *payload_cols]]
                  for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        rows = pd.concat(chunks, ignore_index=True)   # dups of ONE key
        rows = rows.sort_values(list(payload_cols), kind="mergesort")
        state.update((True,))
        yield rows.iloc[[0]]

    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def running_totals(events: DataFrame, key_col: str = "user_id",
                   value_col: str = "value") -> DataFrame:
    """Per-key running (count, sum) updated each micro-batch — monoid
    state, so restarts and batch boundaries merge exactly."""
    out_schema = T.StructType([
        events.schema[key_col],
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ])

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        got = False
        for pdf in pdfs:
            got = got or len(pdf) > 0
            n += len(pdf)
            s += float(pdf[value_col].sum())
        if got:
            state.update((n, s))
            yield pd.DataFrame({key_col: [key[0]], "n_events": [n],
                                "total": [s]})

    return (events.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_kmv(events: DataFrame, key_col: str = "event_type",
                  id_col: str = "user_id", k: int = 128) -> DataFrame:
    """Streaming KMV distinct-count sketch: per key, state is the
    sorted set of the ``k`` SMALLEST md5 hashes of ``id_col`` seen so
    far — the mergeable bottom-k synopsis from operators/sketches.py
    held as keyed stream state, so an unbounded stream answers "how
    many distinct users per type" in O(k) state per key. Each
    micro-batch emits a (n_kept, kth) snapshot; the k-th minimum only
    ever decreases once the sketch is full, so the final state is
    recoverable from snapshots (max n_kept, then min kth) however the
    stream was micro-batched.

    The hash is computed JVM-side BEFORE the stateful operator (the
    pandas fn only merges sorted strings), and because it is the exact
    kmv_hash the batch operator uses, the finalized stream result must
    EQUAL the batch sketch — which is what lets d70 oracle-check a
    streaming sketch against plain SQL."""
    from pyspark.sql import functions as F
    from ..operators.sketches import _check_k, kmv_hash
    _check_k(k)
    # NULL ids hash to NULL (concat with NULL): drop them up front —
    # a None inside the pandas state set would crash sorted(), and
    # NULLs order differently across engines anyway (review r6)
    hashed = events.select(F.col(key_col),
                           kmv_hash(F.col(id_col)).alias("_h")) \
        .filter(F.col("_h").isNotNull())
    out_schema = T.StructType([
        events.schema[key_col],
        T.StructField("n_kept", T.LongType()),
        T.StructField("kth", T.StringType()),
    ])
    state_schema = T.StructType(
        [T.StructField("hs", T.ArrayType(T.StringType()))])

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        hashes = set(state.get[0]) if state.exists else set()
        got = False
        for pdf in pdfs:
            if len(pdf):
                got = True
                hashes.update(pdf["_h"])
        if not got:
            return
        kept = sorted(hashes)[:k]
        state.update((kept,))
        yield pd.DataFrame({key_col: [key[0]], "n_kept": [len(kept)],
                            "kth": [kept[-1]]})

    return (hashed.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_last_n(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", payload_col: str = "event_id",
                     n: int = 5) -> DataFrame:
    """Streaming per-key LATEST-N buffer — the feature-store primitive
    ("a user's last n interactions") held as O(n) keyed state: two
    parallel arrays (event-time micros + payload) truncated to the n
    latest rows by (ts, payload) order after every micro-batch.

    Each batch emits a snapshot (n_seen, recent payloads newest-first);
    ``n_seen`` is the cumulative input count per key and therefore
    STRICTLY increases on every batch that delivers rows, so the final
    state is always the max-n_seen snapshot however the stream was
    micro-batched — buffer content alone is NOT monotone (a late
    mid-ranked event changes the list without changing its max ts),
    which is why the counter, not the buffer, is the finalization key
    (d75 oracle-checks the finalized buffer against batch SQL).
    """
    from pyspark.sql import functions as F
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    src = events.select(
        F.col(key_col),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        F.col(payload_col).cast("long").alias("_pay"))
    out_schema = T.StructType([
        events.schema[key_col],
        T.StructField("n_seen", T.LongType()),
        T.StructField("recent", T.ArrayType(T.LongType())),
    ])
    state_schema = T.StructType([
        T.StructField("seen", T.LongType()),
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("pay", T.ArrayType(T.LongType())),
    ])

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            seen, ts_a, pay_a = state.get
            items = list(zip(ts_a, pay_a))
        else:
            seen, items = 0, []
        got = 0
        for pdf in pdfs:
            got += len(pdf)
            items.extend(zip(pdf["_ts_us"].astype(int),
                             pdf["_pay"].astype(int)))
        if not got:
            return
        seen += got
        items = sorted(items)[-n:]          # n latest by (ts, payload)
        state.update((seen, [int(t) for t, _ in items],
                      [int(p) for _, p in items]))
        yield pd.DataFrame({
            key_col: [key[0]], "n_seen": [seen],
            "recent": [[int(p) for _, p in reversed(items)]]})

    return (src.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_hll(events: DataFrame, key_col: str = "event_type",
                  id_col: str = "user_id", p: int = 8) -> DataFrame:
    """Streaming HyperLogLog distinct-count sketch: per key, state is
    the 2^p register array (max rho per bucket) from
    operators/sketches.py's portable-HLL contract, held as keyed
    stream state — FIXED-SIZE state per key (2^p small ints) no matter
    how many billions of distinct ids flow past, the property that
    makes HLL the production streaming-cardinality sketch where KMV's
    state grows to k hashes.

    The (idx, rho) register projection runs JVM-side BEFORE the
    stateful operator (hll_register_rows — the exact batch function),
    so the pandas fn only element-maxes integers; the finalized stream
    state must EQUAL the batch sketch, which is what lets d82
    oracle-check a stateful streaming operator against plain SQL
    (the d70 pattern).

    Each micro-batch emits a (n_regs, s_fixed) snapshot. Registers
    only ever grow, so ``n_regs`` is NON-DECREASING and ``s_fixed``
    (the fixed-point harmonic denominator) NON-INCREASING — monotone
    finalization keys (memory note): the final state is the
    (max n_regs, then min s_fixed) snapshot however the stream was
    micro-batched."""
    from pyspark.sql import functions as F
    from ..operators.sketches import _check_hll, _HEX_DIGITS, \
        hll_register_rows
    _check_hll(p)
    m = 1 << p
    rmax = 4 * _HEX_DIGITS - p + 1
    rows = hll_register_rows(events, id_col, [key_col], p)
    out_schema = T.StructType([
        events.schema[key_col],
        T.StructField("n_regs", T.LongType()),
        T.StructField("s_fixed", T.LongType()),
    ])
    state_schema = T.StructType(
        [T.StructField("regs", T.ArrayType(T.IntegerType()))])

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        regs = list(state.get[0]) if state.exists else [0] * m
        got = False
        for pdf in pdfs:
            if len(pdf):
                got = True
                for idx, rho in zip(pdf["idx"], pdf["rho"]):
                    i = int(idx)
                    if rho > regs[i]:
                        regs[i] = int(rho)
        if not got:
            return
        state.update((regs,))
        n_regs = sum(1 for r in regs if r > 0)
        s_fixed = sum((1 << (rmax - r)) if r > 0 else (1 << rmax)
                      for r in regs)
        yield pd.DataFrame({key_col: [key[0]], "n_regs": [n_regs],
                            "s_fixed": [s_fixed]})

    return (rows.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_cm(events: DataFrame, key_col: str = "user_id",
                 depth: int = 3, width: int = 512,
                 salt: str = "cm") -> DataFrame:
    """Streaming count-min sketch: the stream's grouping key is the CM
    ROW (0..depth-1) and each row's state is its ``width`` counters —
    depth state entries total, each O(width), however many billions of
    events flow past. Counters are mergeable BY ADDITION, so the
    per-batch update is a bucket-wise sum.

    The (row, bucket) projection runs JVM-side with the EXACT batch
    hash (operators/sketches.cm_hash_bucket), so the finalized stream
    state equals the batch cm_sketch cell for cell — plain SQL oracles
    the stateful operator (the d70/d82 pattern, completing the
    batch+stream pairing for the third sketch family).

    Snapshots emit (row, n_seen, cells) with ``cells`` the
    comma-joined counter vector; ``n_seen`` (cumulative inputs per
    row) strictly increases on every data batch — the monotone
    finalization key (memory note)."""
    from pyspark.sql import functions as F
    from ..operators.sketches import _check_cm, cm_hash_bucket
    _check_cm(depth, width)
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)]))
    hashed = (events.filter(F.col(key_col).isNotNull())
              .select(F.col(key_col).alias("_k"), rows.alias("row"))
              .select("row", cm_hash_bucket(F.col("_k"), F.col("row"),
                                            width, salt)
                      .alias("bucket")))
    out_schema = T.StructType([
        T.StructField("row", T.IntegerType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("cells", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("seen", T.LongType()),
        T.StructField("c", T.ArrayType(T.LongType())),
    ])

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            seen, cells = state.get
            cells = list(cells)
        else:
            seen, cells = 0, [0] * width
        got = 0
        for pdf in pdfs:
            got += len(pdf)
            for b, n in pdf["bucket"].value_counts().items():
                cells[int(b)] += int(n)
        if not got:
            return
        seen += got
        state.update((seen, cells))
        yield pd.DataFrame({"row": [key[0]], "n_seen": [seen],
                            "cells": [",".join(map(str, cells))]})

    return (hashed.groupBy("row")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def streaming_hist(events: DataFrame, key_col: str = "event_type",
                   value_col: str = "value", lo: float = 0.0,
                   hi: float = 640.0, n_bins: int = 64) -> DataFrame:
    """Streaming histogram-quantile sketch: per key, state is the
    fixed-width bin-count vector (n_bins longs) from
    operators/sketches.py's histogram contract — counts merge BY
    ADDITION, so the per-batch update is a bucket-wise sum and state
    stays O(n_bins) per key at any throughput (the same
    fixed-size-state property that makes HLL/CM streamable; quantile
    monitoring over an unbounded stream with bounded memory).

    The bin projection runs JVM-side with the EXACT batch function
    (hist_bin + the same NULL/NaN drop), so the finalized stream state
    equals batch hist_counts cell for cell and plain SQL oracles the
    stateful operator end to end (the d70/d82/d85 pattern — with this,
    all four sketch families ship batch AND streaming forms).

    Snapshots emit (key, n_seen, cells) with ``cells`` the comma-joined
    counter vector; ``n_seen`` strictly increases on every data batch —
    the monotone finalization key (memory note)."""
    from pyspark.sql import functions as F
    from ..operators.sketches import _check_hist, hist_bin
    _check_hist(lo, hi, n_bins)
    v = F.col(value_col).cast("double")
    binned = (events.filter(v.isNotNull() & ~F.isnan(v))
              .select(F.col(key_col),
                      hist_bin(F.col(value_col), lo, hi, n_bins)
                      .alias("bin")))
    out_schema = T.StructType([
        events.schema[key_col],
        T.StructField("n_seen", T.LongType()),
        T.StructField("cells", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("seen", T.LongType()),
        T.StructField("c", T.ArrayType(T.LongType())),
    ])

    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            seen, cells = state.get
            cells = list(cells)
        else:
            seen, cells = 0, [0] * n_bins
        got = 0
        for pdf in pdfs:
            got += len(pdf)
            for b, n in pdf["bin"].value_counts().items():
                cells[int(b)] += int(n)
        if not got:
            return
        seen += got
        state.update((seen, cells))
        yield pd.DataFrame({key_col: [key[0]], "n_seen": [seen],
                            "cells": [",".join(map(str, cells))]})

    return (binned.groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
