"""SCD Type-2 merge: history-keeping dimension maintenance.

The reference maintains dims as SCD Type-1 (update-in-place, no history —
SURVEY.md section 1.1); Type-2 is the standard sibling an analytics
engine is expected to offer: changed attributes EXPIRE the current row
(``valid_to`` stamped, ``is_current`` false) and INSERT a new version, so
facts can join to the dimension *as of* their event time (via the as-of
join in ``operators/asof`` or a ``valid_from <= ts < valid_to`` range
predicate).

Same portability stance as ``plans/scd``: pure-DataFrame state
transition + atomic swap, Delta/Iceberg drop in at the same API for
file-level rewrites.

Scale shape: one hash join between the current slice of the target and
the (typically small, broadcastable) source batch; history rows are
untouched pass-through — with the table partitioned on ``is_current``
(or stored as current/history sibling tables) the rewrite only touches
the current partition.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAR_FUTURE = dt.datetime(9999, 12, 31)


def scd2_init(source: DataFrame, valid_from: dt.datetime) -> DataFrame:
    """Initial load: every source row becomes the current version."""
    return source.select(
        "*",
        F.lit(valid_from).alias("valid_from"),
        F.lit(FAR_FUTURE).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def merge_scd2_df(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    batch_ts: dt.datetime,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Return the post-merge SCD2 state.

    - new business key        -> inserted as current
    - changed compare_cols    -> old current row expired at ``batch_ts``,
                                 new current version inserted
    - unchanged / absent key  -> passed through untouched
    - history rows            -> passed through untouched

    Deletes are not tracked (absence from a batch is not a delete — the
    reference's incremental batches are partial), matching SCD1 semantics.
    """
    if target is None:
        return scd2_init(source, batch_ts)
    if compare_cols is None:
        compare_cols = [c for c in source.columns if c not in keys]

    meta = ["valid_from", "valid_to", "is_current"]
    history = target.filter(~F.col("is_current"))
    current = target.filter(F.col("is_current"))

    src = source.select(
        *keys,
        *[F.col(c).alias(f"__src_{c}") for c in compare_cols],
        F.lit(True).alias("__src_present"),
    )
    joined = current.join(src, list(keys), "full_outer")

    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__src_{c}"))
    in_target = F.col("valid_from").isNotNull()  # never null on target rows
    in_src = F.col("__src_present").isNotNull()
    # classify once, reuse in both branches
    changed = in_target & in_src & ~same

    # surviving target rows: unchanged keep current; changed get expired
    survivors = joined.filter(in_target).select(
        *keys,
        *compare_cols,
        "valid_from",
        F.when(changed, F.lit(batch_ts)).otherwise(F.col("valid_to")).alias("valid_to"),
        F.when(changed, F.lit(False)).otherwise(F.col("is_current")).alias("is_current"),
    )
    # new versions: brand-new keys + new versions of changed keys
    fresh = joined.filter(in_src & (~in_target | ~same)).select(
        *keys,
        *[F.col(f"__src_{c}").alias(c) for c in compare_cols],
        F.lit(batch_ts).alias("valid_from"),
        F.lit(FAR_FUTURE).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    out_cols = [*keys, *compare_cols, *meta]
    return (
        history.select(*out_cols)
        .unionByName(survivors.select(*out_cols))
        .unionByName(fresh.select(*out_cols))
    )


def as_of(state: DataFrame, ts: dt.datetime) -> DataFrame:
    """Point-in-time dimension snapshot: the version of each key whose
    validity interval contains ``ts`` (half-open: ``valid_from <= ts <
    valid_to``, so a version expiring at T and its successor starting at
    T never both match). A FILTER, not a join — Catalyst pushes both
    comparisons to the scan, so at 100 TB the snapshot costs a pruned
    read of the dimension, and fact-side temporal lookups join against
    this filtered relation with a plain equi-join on the business key."""
    return state.filter(
        (F.col("valid_from") <= F.lit(ts)) & (F.col("valid_to") > F.lit(ts))
    )
