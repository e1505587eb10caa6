"""Snapshot diff semantics (operators/diff.py)."""

from __future__ import annotations


def test_snapshot_diff_classifies_all_cases(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.diff import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", None), (4, "d", 41.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {
        1: "deleted",
        2: "unchanged",
        3: "unchanged",  # null == null under eqNullSafe
        4: "changed",
        5: "inserted",
    }


def test_snapshot_diff_carries_old_and_new_values(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.diff import (
        snapshot_diff,
    )

    old = spark.createDataFrame([(1, 10.0)], "k long, v double")
    new = spark.createDataFrame([(1, 11.0)], "k long, v double")
    row = snapshot_diff(old, new, ["k"]).collect()[0]
    assert (row["v_old"], row["v_new"], row["change"]) == (10.0, 11.0, "changed")


def test_apply_changelog_roundtrips_diff(spark):
    """apply(old, changelog(diff(old, new))) == new for a state with all
    four change classes, including deletes (the semantic SCD1 lacks)."""
    from pyspark.sql import functions as F

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.diff import (
        apply_changelog,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)], ["k", "s", "v"]
    )  # 1 deleted, 2 unchanged, 3 changed, 4 inserted
    diff = snapshot_diff(old, new, ["k"])
    changelog = diff.filter(F.col("change") != "unchanged").select(
        "k",
        F.when(F.col("change") == "inserted", "I")
        .when(F.col("change") == "deleted", "D")
        .otherwise("U")
        .alias("op"),
        F.col("s_new").alias("s"),
        F.col("v_new").alias("v"),
    )
    got = apply_changelog(old, changelog, ["k"], ["s", "v"])
    assert got.exceptAll(new).count() == 0
    assert new.exceptAll(got).count() == 0
