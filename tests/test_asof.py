"""As-of join semantics (operators/asof.py).

The reference has no temporal joins; these pin the engine extension's
semantics against hand-computed expectations and (in the catalog check)
DuckDB's ASOF JOIN.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00"), 100.0),
            (2, "u1", _ts("2024-01-01 12:00:00"), 200.0),
            (3, "u2", _ts("2024-01-01 09:00:00"), 300.0),  # before any right row
            (4, "u3", _ts("2024-01-01 11:00:00"), 400.0),  # key missing on right
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 1.0),
            ("u1", _ts("2024-01-01 10:00:00"), 2.0),  # exact tie with event 1
            ("u1", _ts("2024-01-01 11:59:00"), 3.0),
            ("u2", _ts("2024-01-01 09:30:00"), 4.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_with_ties_and_misses(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.asof import (
        asof_join,
    )

    left, right = _fixture(spark)
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on="user_id", right_cols=["value"], suffix="_r"
        ).collect()
    }
    assert len(out) == 4
    # exact tie ts==ts matches (right sorts first at equal ts)
    assert out[1]["value_r"] == 2.0
    assert out[1]["ts_r"] == _ts("2024-01-01 10:00:00")
    # latest prior, not first
    assert out[2]["value_r"] == 3.0
    # left row earlier than every right row -> null extension
    assert out[3]["value_r"] is None and out[3]["ts_r"] is None
    # key absent from right entirely -> null extension
    assert out[4]["value_r"] is None
    # left payload survives untouched
    assert out[2]["value"] == 200.0


def test_asof_tolerance(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.asof import (
        asof_join,
    )

    left, right = _fixture(spark)
    out = {
        r["event_id"]: r
        for r in asof_join(
            left,
            right,
            on="user_id",
            right_cols=["value"],
            suffix="_r",
            tolerance_seconds=120.0,
        ).collect()
    }
    # event 2's nearest prior view is 1 min old -> kept
    assert out[2]["value_r"] == 3.0
    # event 1's match is an exact tie (0 s) -> kept
    assert out[1]["value_r"] == 2.0
    # no prior match at all stays null
    assert out[3]["value_r"] is None


def test_asof_plan_has_single_shuffle(spark):
    """The scale contract: union+window compiles to ONE hash exchange
    (by key), never a join."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.asof import (
        asof_join,
    )

    left, right = _fixture(spark)
    plan = (
        asof_join(left, right, on="user_id", right_cols=["value"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
