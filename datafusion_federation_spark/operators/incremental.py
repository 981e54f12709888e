"""Incremental-pipeline operators: snapshot diffing and CDC merge.

A 100 TB training corpus is refreshed, not rebuilt: each cycle produces
a new snapshot (diff it against the previous one to re-process ONLY
what moved — the delta feeds incremental dedup d33, embedding refresh,
shard rebuilds) or a changeset (apply it latest-wins to the base —
SCD1 upsert, the mutable-catalog twin of temporal.scd2_history which
keeps every version).

Both operators are pure DataFrame compositions that shuffle each input
ONCE on the entity key:

- ``snapshot_diff``: full outer join old/new on the keys; row status
  from key presence + a NULL-SAFE struct comparison of the compared
  columns (``eqNullSafe`` — one changed-vs-unchanged verdict that
  cannot leak UNKNOWN on NULL fields, the same total semantics as the
  IS DISTINCT FROM predicate in expressions.py). No content hash: a
  hash would save nothing here (the join already co-locates the pair)
  and md5-vs-native tradeoffs belong to the dedup family.
- ``cdc_apply``: latest change per key (one window over the changeset,
  deterministic via required tiebreak), then base rows whose key is
  untouched (left_anti) unioned with surviving upserts. Deletes drop,
  upserts replace, inserts append — the result has exactly the base
  schema.

100 TB posture: both shuffle on the key columns only; the changeset
window partitions by key (bounded by per-key churn, not corpus size).
For a base snapshot stored bucketed by the same keys, the anti join
and the outer join are shuffle-free on the base side. Skewed hot keys
inherit the salting patterns in operators/skew.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: diff output statuses, in the fixed report order
DIFF_STATUSES = ("added", "changed", "removed", "unchanged")


def _check_keys(df: DataFrame, keys: Sequence[str], side: str) -> None:
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"{side} is missing key columns {missing}")


def snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
                  compare_cols: Optional[Sequence[str]] = None,
                  status_col: str = "status") -> DataFrame:
    """Per-key delta between two snapshot versions: the key columns +
    ``status_col`` in {added, changed, removed, unchanged}.

    ``compare_cols`` picks the content columns for the
    changed-vs-unchanged verdict (default: every shared non-key
    column). Comparison is null-safe per the whole struct — a row
    whose compared field went NULL->3 or 3->NULL is ``changed``, and
    NULL==NULL is ``unchanged`` (never UNKNOWN).

    One full outer sort-merge join on ``keys``, with NULL-SAFE key
    equality — a row whose key contains a NULL field still pairs with
    its counterpart instead of reporting added+removed forever.
    Downstreams typically filter to one status (the added/changed
    slice that needs re-processing), which Catalyst pushes below this
    projection.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    _check_keys(old, keys, "old")
    _check_keys(new, keys, "new")
    if compare_cols is None:
        shared = [c for c in old.columns
                  if c in set(new.columns) and c not in set(keys)]
        compare_cols = shared
    else:
        _check_keys(old, compare_cols, "old")
        _check_keys(new, compare_cols, "new")
    if status_col in keys:
        raise ValueError(f"status_col {status_col!r} collides with a key")

    o = old.select(*[F.col(k).alias(f"_ok_{k}") for k in keys],
                   *[F.col(c).alias(f"_o_{c}") for c in compare_cols])
    n = new.select(*[F.col(k).alias(f"_nk_{k}") for k in keys],
                   *[F.col(c).alias(f"_n_{c}") for c in compare_cols])
    # presence markers survive the outer join where columns from the
    # missing side are NULL (and distinguish a genuinely-NULL key
    # field from an absent row)
    o = o.withColumn("_o_present", F.lit(1))
    n = n.withColumn("_n_present", F.lit(1))
    # NULL-SAFE key equality: a plain equi-join (`on=keys`) silently
    # never pairs rows whose key contains a NULL field, so an
    # identical NULL-keyed row would report added+removed on EVERY
    # refresh (review r7) — <=> join keys are still hash-planned
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
    j = o.join(n, on=cond, how="full_outer")

    if compare_cols:
        same: Column = F.struct(
            *[F.col(f"_o_{c}") for c in compare_cols]).eqNullSafe(
            F.struct(*[F.col(f"_n_{c}") for c in compare_cols]))
    else:
        same = F.lit(True)
    status = (F.when(F.col("_o_present").isNull(), F.lit("added"))
              .when(F.col("_n_present").isNull(), F.lit("removed"))
              .when(same, F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    # on a matched (null-safe) pair either side's key works; coalesce
    # also covers the one-sided rows, and a matched NULL field stays
    # NULL (both sides NULL)
    out_keys = [F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}"))
                .alias(k) for k in keys]
    return j.select(*out_keys, status.alias(status_col))


def cdc_apply(base: DataFrame, changes: DataFrame, keys: Sequence[str],
              order_col: str, op_col: str = "op",
              tiebreak: Optional[str] = None,
              delete_op: str = "D") -> DataFrame:
    """Apply a changeset to a base snapshot, latest change per key
    winning: rows with ``op_col == delete_op`` drop the key, any other
    op replaces (or inserts) the row. Returns exactly the base schema.

    ``order_col`` orders a key's changes (commit sequence, timestamp);
    ``tiebreak`` breaks exact ties deterministically — REQUIRED when
    two changes to one key can share an ``order_col`` value, or
    which-one-wins is engine-arbitrary. A NULL ``op_col`` value is an
    upsert (it is not the delete op — the comparison is null-safe).

    Shape: one window over the changeset (partition by key — bounded
    by per-key churn), one left_anti join base-vs-touched-keys, one
    union. All three hash on ``keys``.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    _check_keys(base, keys, "base")
    _check_keys(changes, keys, "changes")
    for c in (order_col, op_col):
        if c not in changes.columns:
            raise ValueError(f"changes is missing column {c!r}")
    extra = [c for c in base.columns if c not in changes.columns]
    if extra:
        raise ValueError(f"changes is missing base columns {extra}")

    order = [F.col(order_col).desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).desc())
    w = W.partitionBy(*keys).orderBy(*order)
    latest = (changes.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1))
    untouched = base.join(latest.select(*keys), on=list(keys),
                          how="left_anti")
    # null-safe: a NULL op is an UPSERT (it is not the delete op) —
    # the plain `!=` would evaluate UNKNOWN and silently drop the row
    # from upserts while its key was already anti-joined out of base,
    # vanishing the key with no error (review r7)
    upserts = (latest.filter(~F.col(op_col)
                             .eqNullSafe(F.lit(delete_op)))
               .select(*base.columns))
    return untouched.unionByName(upserts)
