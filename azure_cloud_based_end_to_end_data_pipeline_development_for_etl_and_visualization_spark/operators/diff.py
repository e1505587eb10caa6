"""Snapshot diff: classify rows between two table states.

The reference detects changes implicitly (left join + isNull split,
SURVEY.md section 3.2 stage 4) and applies them with MERGE; this operator
makes change detection a first-class output — the CDC feed a downstream
consumer (audit, incremental cache invalidation, reverse ETL) needs:
``inserted`` / ``deleted`` / ``changed`` / ``unchanged`` per key.

Plan shape: one full-outer hash join on the keys plus a column-compare
expression — the keys shuffle once, payload comparison is JVM-side.
At 100 TB both snapshots hash-partition; if snapshots are stored
hive-partitioned (plans/medallion ``fact_partition_cols``) and the diff
is scoped to recent partitions, partition pruning cuts both scans first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Full-outer diff of two snapshots on ``keys``.

    Returns ``*keys, change`` plus ``<col>_old`` / ``<col>_new`` for every
    compared column. ``change`` ∈ {'inserted','deleted','changed',
    'unchanged'}. Null-safe comparison (``eqNullSafe``) so null payloads
    compare equal."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]

    o = old.select(*keys, *[F.col(c).alias(f"{c}_old") for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"{c}_new") for c in compare_cols])
    o = o.withColumn("__in_old", F.lit(True))
    n = n.withColumn("__in_new", F.lit(True))

    joined = o.join(n, list(keys), "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_old").eqNullSafe(F.col(f"{c}_new"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("inserted"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *keys,
        change.alias("change"),
        *[F.col(f"{c}_old") for c in compare_cols],
        *[F.col(f"{c}_new") for c in compare_cols],
    )
