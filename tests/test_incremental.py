"""Incremental rollup maintenance: merge of per-batch states must equal a
full recompute bit-for-bit, for any batch split."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.incremental import (
    aggregate_state,
    finalize_state,
    merge_state,
)


def test_merge_many_batches_equals_full_recompute(spark, sf_dir):
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    keys = ["o_orderpriority"]
    sums = {"total_price": "o_totalprice"}

    full = finalize_state(aggregate_state(orders, keys, sums), keys)

    state = None
    for i in range(5):  # five uneven batches
        batch = orders.filter(F.col("o_orderkey") % 5 == i)
        s = aggregate_state(batch, keys, sums)
        state = s if state is None else merge_state(state, s, keys)

    inc = finalize_state(state, keys)
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0  # doubles bit-equal via decimal state


def test_merge_handles_new_groups(spark):
    a = spark.createDataFrame([("x", 1.5), ("x", 2.5)], ["k", "v"])
    b = spark.createDataFrame([("y", 10.0)], ["k", "v"])
    sa = aggregate_state(a, ["k"], {"sv": "v"})
    sb = aggregate_state(b, ["k"], {"sv": "v"})
    out = {r["k"]: r for r in finalize_state(merge_state(sa, sb, ["k"]), ["k"]).collect()}
    assert out["x"]["n_rows"] == 2 and out["x"]["sv"] == 4.0
    assert out["y"]["n_rows"] == 1 and out["y"]["sv"] == 10.0


def test_profile_columns_planted(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.quality import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "c")], ["id", "s"]
    )
    out = {r["col_name"]: r for r in profile_columns(df, ["id", "s"]).collect()}
    assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "3"
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 3
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "c"


def test_profile_columns_approx_matches_exact_within_rsd(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.quality import (
        profile_columns,
    )

    df = spark.range(5000).selectExpr("id", "cast(id % 997 as string) as s")
    exact = {
        r["col_name"]: r["n_distinct"]
        for r in profile_columns(df, ["id", "s"], approx=False).collect()
    }
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile_columns(df, ["id", "s"], approx=True, rsd=0.05).collect()
    }
    for c in ("id", "s"):
        assert abs(approx[c] - exact[c]) <= 0.15 * exact[c]


def test_profile_columns_default_plan_has_no_expand(spark):
    """The approx default must plan as plain partial aggregation — the
    exact multi-distinct Expand (rows x n_cols+1) is opt-in only."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.quality import (
        profile_columns,
    )

    df = spark.range(100).selectExpr("id", "cast(id as string) as s")
    approx_plan = profile_columns(df, ["id", "s"])._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx_plan
    exact_plan = profile_columns(df, ["id", "s"], approx=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # sanity: the flag actually switches modes
