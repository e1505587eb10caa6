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


def apply_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    keys: Sequence[str],
    payload_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog (ops ``I``/``U``/``D`` per key) to a
    snapshot — the inverse of :func:`snapshot_diff`, and the delete-aware
    superset of the SCD1 merge (which only upserts):

    - ``D`` rows remove the key from the snapshot;
    - ``U`` rows replace the key's payload;
    - ``I`` rows add new keys.

    ``apply_changelog(old, diff-as-changelog, ...)`` reconstructs the new
    snapshot exactly (property-tested roundtrip). Duplicate keys in one
    changelog batch are an error upstream (same contract as the SCD1
    merge's duplicate-match probe).

    Plan shape: one anti join (touched keys drop out) + one union of the
    surviving I/U payloads. The changelog is batch-sized by the ingestion
    contract, but that bound is a runtime property, not a structural one —
    so the anti join is unhinted and AQE converts it to broadcast when the
    changelog's runtime size is genuinely small. At 100 TB this is the
    read path of a merge-on-read table format, expressed directly."""
    touched = changelog.select(*keys)
    kept = snapshot.join(touched, list(keys), "left_anti")
    upserts = changelog.filter(F.col(op_col).isin("I", "U")).select(
        *keys, *payload_cols
    )
    return kept.select(*keys, *payload_cols).unionByName(upserts)
