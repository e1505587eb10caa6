"""SCD Type-3 merge: previous-value columns instead of history rows.

Kimball's third slowly-changing-dimension pattern, completing the family
next to :mod:`.scd` (Type 1, overwrite) and :mod:`.scd2` (Type 2, history
rows): for each TRACKED attribute the dimension carries a ``prev_<attr>``
column holding the value the attribute had before its most recent change.
Useful when reports need "current vs prior" comparisons (territory
realignments are the textbook case) without the row explosion of Type 2.

The reference's gold dimensions use Delta MERGE for their upserts
(gold_dim_branch.ipynb:88163-88167 cell 35); Type 3 is the same
source-to-target join rewrite with a conditional carry of the old value:

- matched, tracked attribute CHANGED   -> ``prev_c`` := old current value
- matched, tracked attribute unchanged -> ``prev_c`` carried through
  (re-merging the same batch is a no-op — idempotence, pinned in
  tests/test_scd_pipeline.py)
- not matched (new key)                -> insert with ``prev_c`` NULL
- target-only key                      -> carried through unchanged

Scale: one full-outer join on the merge keys per batch; with a small
incremental source AQE broadcasts it, so the dimension is scanned once —
the same shape as the Type-1 rewrite in :mod:`.scd`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .scd import _check_unique_source_keys


def merge_scd3_df(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
) -> DataFrame:
    """Merge ``source`` into ``target`` with Type-3 previous-value
    tracking for the ``tracked`` attribute columns.

    ``target`` is the prior dimension state carrying ``prev_<c>`` columns
    (pass ``None`` to initialize: every ``prev_<c>`` starts NULL).
    Non-tracked attributes overwrite Type-1 style. Raises
    :class:`~..plans.scd.DuplicateMergeKeyError` when two source rows hit
    one key, mirroring Delta's merge contract."""
    _check_unique_source_keys(source, keys)
    attrs = [c for c in source.columns if c not in keys]
    if target is None:
        out = source.select(*keys, *attrs)
        for c in tracked:
            out = out.withColumn(
                f"prev_{c}", F.lit(None).cast(out.schema[c].dataType)
            )
        return out
    t = target.withColumn("__t", F.lit(1)).alias("t")
    s = source.withColumn("__s", F.lit(1)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    j = t.join(s, cond, "full_outer")
    in_s = F.col("s.__s").isNotNull()
    in_t = F.col("t.__t").isNotNull()
    cols = [F.coalesce(F.col(f"s.{k}"), F.col(f"t.{k}")).alias(k) for k in keys]
    for c in attrs:
        cols.append(
            F.when(in_s, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        )
    for c in tracked:
        cols.append(
            F.when(
                in_s & in_t & ~F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}")),
                F.col(f"t.{c}"),
            )
            .when(in_t, F.col(f"t.prev_{c}"))
            .otherwise(F.lit(None))
            .alias(f"prev_{c}")
        )
    return j.select(*cols)
