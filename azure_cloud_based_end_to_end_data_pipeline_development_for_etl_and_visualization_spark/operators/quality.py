"""Data-quality constraint checks (deequ/dbt-test style).

The reference verifies nothing (SURVEY.md section 5: 61 display() calls,
zero asserts); a production medallion pipeline gates layer promotion on
declared constraints. Each check compiles to ONE aggregate over the table
— Spark collapses a batch of checks on the same table into a single scan
— and returns ``(check, violations)`` rows, so the gate is
``violations == 0`` and failures are quantified, not boolean.

Scale: every check is a map-side-combined aggregate (count of predicate
failures); uniqueness is one groupBy on the key; referential integrity is
a left-anti join (broadcast when the parent is a dim). No collects — the
report itself is a DataFrame you can sink next to the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _report(name: str, violations: Column, df: DataFrame) -> DataFrame:
    return df.agg(violations.cast("long").alias("violations")).select(
        F.lit(name).alias("check"), "violations"
    )


def check_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return _report(
        name or f"not_null({col})",
        F.count(F.lit(1)) - F.count(F.col(col)),
        df,
    )


def check_unique(df: DataFrame, cols: Sequence[str], name: str | None = None) -> DataFrame:
    nm = name or f"unique({','.join(cols)})"
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
    )
    return dup.agg(
        F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).cast("long").alias("violations")
    ).select(F.lit(nm).alias("check"), "violations")


def check_in_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str | None = None
) -> DataFrame:
    return _report(
        name or f"in_range({col},[{lo},{hi}])",
        F.sum(
            F.when(
                F.col(col).isNull() | ~F.col(col).between(lo, hi), 1
            ).otherwise(0)
        ),
        df,
    )


def check_referential(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    nm = name or f"fk({child_key}->{parent_key})"
    # Conventional FK semantics (and SQL NOT IN): a NULL child key is not a
    # violation — only non-null keys must resolve to a parent. Without this
    # filter the anti join would count every null child row as an orphan.
    non_null_children = child.filter(F.col(child_key).isNotNull())
    orphans = non_null_children.join(
        F.broadcast(parent.select(parent_key).distinct()),
        non_null_children[child_key] == parent[parent_key],
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(nm).alias("check"), "violations"
    )


def run_checks(checks: Sequence[DataFrame]) -> DataFrame:
    """Union individual check reports into one (check, violations) table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
