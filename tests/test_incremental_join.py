"""Incremental JOIN-view maintenance (plans/incremental.
incremental_join_delta): after every refresh the materialized view must
equal a full recompute of the inputs-so-far — including the batch where
BOTH sides receive appends (the cross term dL x dR must appear exactly
once) — and no delta term may touch history x history."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.incremental import (
    incremental_join_delta,
)
from tests.conftest import assert_df_equal


def _inputs(spark, sf_dir):
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    o = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    c_old = cust.filter(F.col("c_custkey") % 2 == 0)
    c_new = cust.filter(F.col("c_custkey") % 2 == 1)
    return o, c_old, c_new, cust


def test_view_matches_recompute_after_every_batch(spark, sf_dir):
    o, c_old, c_new, cust = _inputs(spark, sf_dir)
    on = F.col("o_custkey") == F.col("c_custkey")

    view = incremental_join_delta(o[0], None, None, c_old, on)
    assert_df_equal(view, o[0].join(c_old, on), sort_by=["o_orderkey"])

    d2 = incremental_join_delta(o[1], o[0], c_new, cust, on)
    view = view.unionByName(d2)
    left2 = o[0].unionByName(o[1])
    assert_df_equal(view, left2.join(cust, on), sort_by=["o_orderkey"])

    d3 = incremental_join_delta(o[2], left2, None, cust, on)
    view = view.unionByName(d3)
    left3 = left2.unionByName(o[2])
    assert_df_equal(view, left3.join(cust, on), sort_by=["o_orderkey"])


def test_cross_term_appears_exactly_once(spark, sf_dir):
    """dL x dR lives inside dL JOIN R_new; if L_prev JOIN dR used R-side
    history incorrectly (or dL joined R_prev only), the both-sides batch
    would drop or duplicate cross rows. Count-exact check."""
    o, c_old, c_new, cust = _inputs(spark, sf_dir)
    on = F.col("o_custkey") == F.col("c_custkey")
    d2 = incremental_join_delta(o[1], o[0], c_new, cust, on)
    expected = (
        o[1].join(cust, on).count() + o[0].join(c_new, on).count()
    )
    assert d2.count() == expected
    cross = o[1].join(c_new, on).count()
    assert cross > 0  # the scenario actually exercises the cross term


def test_no_delta_returns_none(spark, sf_dir):
    o, c_old, _c_new, _cust = _inputs(spark, sf_dir)
    on = F.col("o_custkey") == F.col("c_custkey")
    assert incremental_join_delta(None, o[0], None, c_old, on) is None
