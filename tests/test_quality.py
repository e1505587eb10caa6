"""Constraint checks report exact violation counts (operators/quality.py)."""

from __future__ import annotations


def test_checks_count_planted_violations(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.quality import (
        check_in_range,
        check_not_null,
        check_referential,
        check_unique,
        run_checks,
    )

    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, -5.0), (2, None), (9, 30.0)],
        "k long, v double",
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk long")

    report = {
        r["check"]: r["violations"]
        for r in run_checks(
            [
                check_unique(child, ["k"]),          # k=1 x3 -> 2 extra rows
                check_not_null(child, "v"),          # one null
                check_in_range(child, "v", 0.0, 100.0),  # -5.0 and null
                check_referential(child, "k", parent, "pk"),  # k=9 orphan
            ]
        ).collect()
    }
    assert report["unique(k)"] == 2
    assert report["not_null(v)"] == 1
    assert report["in_range(v,[0.0,100.0])"] == 2
    assert report["fk(k->pk)"] == 1


def test_clean_table_reports_zero(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.quality import (
        check_unique,
    )

    df = spark.createDataFrame([(1,), (2,)], "k long")
    assert check_unique(df, ["k"]).collect()[0]["violations"] == 0


def test_quarantine_split_rejects_reserved_column_collision(spark):
    """Input columns named valid/reasons would be silently overwritten
    then dropped on the valid route -- fail fast instead."""
    import pytest
    from pyspark.sql import functions as F

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.quality import (
        quarantine_split,
    )

    df = spark.createDataFrame([(1, True)], ["id", "valid"])
    with pytest.raises(ValueError, match="valid"):
        quarantine_split(df, {"pos": F.col("id") > 0})
