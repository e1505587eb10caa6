"""SCD Type-2 merge semantics (plans/scd2.py)."""

from __future__ import annotations

import datetime as dt

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.scd2 import (
    FAR_FUTURE,
    merge_scd2_df,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def _src(spark, rows):
    return spark.createDataFrame(rows, "k long, name string")


def test_scd2_three_batch_history(spark):
    # batch 0: initial
    state = merge_scd2_df(None, _src(spark, [(1, "a"), (2, "b")]), ["k"], T0)
    assert state.count() == 2
    assert state.filter("is_current").count() == 2

    # batch 1: k=1 changes, k=3 appears, k=2 absent (partial batch)
    state = merge_scd2_df(state, _src(spark, [(1, "a2"), (3, "c")]), ["k"], T1)
    rows = {(r["k"], r["name"]): r for r in state.collect()}
    assert len(rows) == 4
    old = rows[(1, "a")]
    assert (old["is_current"], old["valid_to"]) == (False, T1)
    new = rows[(1, "a2")]
    assert (new["is_current"], new["valid_from"], new["valid_to"]) == (True, T1, FAR_FUTURE)
    assert rows[(2, "b")]["is_current"] is True  # absent != deleted
    assert rows[(3, "c")]["valid_from"] == T1

    # batch 2: k=1 changes again -> two history rows + one current
    state = merge_scd2_df(state, _src(spark, [(1, "a3")]), ["k"], T2)
    k1 = state.filter("k = 1").orderBy("valid_from").collect()
    assert [(r["name"], r["is_current"]) for r in k1] == [
        ("a", False),
        ("a2", False),
        ("a3", True),
    ]
    # validity intervals chain with no gaps
    assert k1[0]["valid_to"] == k1[1]["valid_from"] == T1
    assert k1[1]["valid_to"] == k1[2]["valid_from"] == T2


def test_scd2_idempotent_on_unchanged_batch(spark):
    state = merge_scd2_df(None, _src(spark, [(1, "a"), (2, "b")]), ["k"], T0)
    again = merge_scd2_df(state, _src(spark, [(1, "a"), (2, "b")]), ["k"], T1)
    assert again.count() == 2  # no new versions for unchanged rows
    assert again.filter("is_current").count() == 2


def test_scd2_asof_lookup(spark):
    """The point of SCD2: an as-of predicate recovers the attribute at any
    past time."""
    import pyspark.sql.functions as F

    state = merge_scd2_df(None, _src(spark, [(1, "a")]), ["k"], T0)
    state = merge_scd2_df(state, _src(spark, [(1, "a2")]), ["k"], T1)
    asof = dt.datetime(2024, 1, 15)
    row = state.filter(
        (F.col("k") == 1)
        & (F.col("valid_from") <= F.lit(asof))
        & (F.lit(asof) < F.col("valid_to"))
    ).collect()
    assert [r["name"] for r in row] == ["a"]
