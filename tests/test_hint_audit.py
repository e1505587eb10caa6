"""Mechanized broadcast-hint audit over the ENTIRE query catalog.

Round 7 found two forced broadcasts of fact-scaling relations; round 8
fixed them and introduced a third (q_repeat_rate's part join) in the
same session. Hand-reviewing hint sites does not converge, so the rule
is now a catalog-wide plan sweep (tools/hint_audit.py): every broadcast
hint surviving into the optimized logical plan must sit on a subtree
whose output cardinality is bounded independent of fact-table size —
ungrouped aggregates, bounded-domain groupings, limits, nation/region
scans, driver-created literals, fixed-size sketch artifacts.

A regression (hinting customer/part/orders/lineitem/events/documents/
embeddings or any unbounded derivation) fails the sweep by name.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)
from tools.hint_audit import audit_hints, audit_windows

ALL_QUERIES = sorted(catalog.QUERIES)


# Queries whose plans legitimately contain Python: the multimodal decode
# boundary (Arrow MapInPandas by design) and the pandas_udf scoring stub.
PYTHON_EXEMPT = {
    "q_multimodal_digest", "q_multimodal_features", "q_multimodal_resize",
    "q_multimodal_frames", "q_multimodal_chunks", "q_multimodal_dedup",
    "q_text_model_score",
}


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_scale_contract_sweep(spark, sf_dir, name):
    """One plan build, three catalog-wide contracts: (1) every broadcast
    hint sits on a structurally bounded subtree (tools/hint_audit), and
    (2) no row-at-a-time or Arrow Python evaluation in any batch hot
    path outside the documented multimodal/pandas-udf boundary, and
    (3) no unpartitioned Window over a fact-scaling input (a
    single-reducer sort at 100 TB) — r9 VERDICT item 3."""
    df = catalog.QUERIES[name](spark, sf_dir)
    violations = audit_hints(df) + audit_windows(df)
    assert not violations, "\n".join(violations)
    if name not in PYTHON_EXEMPT:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_audit_catches_deliberate_customer_broadcast(spark, sf_dir):
    """The canary: a forced broadcast of the (fact-scaling) customer table
    MUST be flagged — proves the sweep can fail, not just pass."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    bad = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    violations = audit_hints(bad)
    assert violations, "deliberately-hinted customer join was not flagged"


def test_audit_catches_deliberate_part_broadcast_after_join(spark, sf_dir):
    """The exact shape of the round-8 regression (q_repeat_rate): a part
    broadcast onto a pair-grain aggregate must be flagged."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    pairs = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    bad = pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
    violations = audit_hints(bad)
    assert violations, "deliberately-hinted part join was not flagged"


def test_audit_pipeline_plans_are_clean(spark, sf_dir):
    """The medallion/star pipeline builders — which the catalog sweep never
    sees — must build unhinted-by-default plans even when a dim is
    customer-scaled (r9 VERDICT "What's wrong" #2: build_fact/star_join
    defaulted to forced dim broadcasts while build_dim in the same file had
    removed its hint for exactly this reason)."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.scd import (
        merge_scd1_df,
    )
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.star import (
        build_dim,
        build_fact,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    # customer-shaped dim (fact-scaling at 100 TB), with an existing sink;
    # both audits apply — no forced broadcast AND no unpartitioned window
    # over the dim relation (the surrogate-key path rides the two-phase
    # range rank)
    dim = build_dim(
        cust, ["c_custkey"], ["c_name", "c_nationkey"], "dim_cust_key"
    )
    assert audit_hints(dim) + audit_windows(dim) == []
    dim2 = build_dim(
        cust, ["c_custkey"], ["c_name", "c_nationkey"], "dim_cust_key",
        existing=dim,
    )
    assert audit_hints(dim2) + audit_windows(dim2) == []

    fact = build_fact(
        orders.alias("s"),
        [(dim2.alias("d"),
          F.col("s.o_custkey") == F.col("d.c_custkey"),
          "dim_cust_key")],
        [F.col("s.o_orderkey"), F.col("s.o_totalprice")],
    )
    assert audit_hints(fact) + audit_windows(fact) == []

    merged = merge_scd1_df(dim, dim2, ["dim_cust_key"])
    assert audit_hints(merged) + audit_windows(merged) == []


def test_audit_flags_fact_scaled_dim_optin_broadcast(spark, sf_dir):
    """broadcast_dims=True remains available as the explicit opt-in for
    known-bounded dims — and when misused on a customer-scaled dim the
    audit still catches it (the hint is a caller assertion, not a bypass)."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.star import (
        build_dim,
        build_fact,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = build_dim(
        cust, ["c_custkey"], ["c_name", "c_nationkey"], "dim_cust_key"
    )
    fact = build_fact(
        orders.alias("s"),
        [(dim.alias("d"),
          F.col("s.o_custkey") == F.col("d.c_custkey"),
          "dim_cust_key")],
        [F.col("s.o_orderkey")],
        broadcast_dims=True,
    )
    assert audit_hints(fact), "misused opt-in broadcast was not flagged"


def test_window_audit_catches_global_sort_over_fact(spark, sf_dir):
    """The canary for the unpartitioned-window sweep: a global
    row_number over lineitem (single-reducer sort of the fact) MUST be
    flagged — proves the sweep can fail, not just pass."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bad = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey", "l_linenumber"))
    )
    violations = audit_windows(bad)
    assert violations, "deliberate global fact sort was not flagged"


def test_window_audit_allows_bounded_inputs(spark, sf_dir):
    """Sanity: the legitimate unpartitioned-window classes pass — a
    day-domain aggregate (cumulative daily sum) and a limited top-k."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    daily = (
        li.select(F.to_date("l_shipdate").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ok1 = daily.withColumn(
        "cum", F.sum("n").over(Window.orderBy("d").rowsBetween(
            Window.unboundedPreceding, 0))
    )
    assert audit_windows(ok1) == []

    topk = li.orderBy(F.desc("l_extendedprice")).limit(100)
    ok2 = topk.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("l_extendedprice")))
    )
    assert audit_windows(ok2) == []


def test_surrogate_key_has_no_global_sort(spark, sf_dir):
    """with_surrogate_key now rides the two-phase range rank: same dense
    deterministic keys, no unpartitioned window over the relation."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.relational import (
        with_surrogate_key,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    keyed = with_surrogate_key(cust, ["c_custkey"], "k", start_at=10)
    assert audit_windows(keyed) == []
    rows = keyed.select("k", "c_custkey").orderBy("c_custkey").collect()
    assert [r.k for r in rows] == list(range(10, 10 + len(rows)))
    by_key = sorted(rows, key=lambda r: r.k)
    assert [r.c_custkey for r in by_key] == sorted(r.c_custkey for r in rows)


def test_audit_allows_bounded_hints(spark, sf_dir):
    """Sanity: the legitimate hint classes pass — a 1-row scalar
    crossJoin, a nation scan, and a bounded-domain aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")

    total = li.agg(F.sum("l_quantity").alias("t"))
    ok1 = li.crossJoin(F.broadcast(total))
    assert audit_hints(ok1) == []

    ok2 = li.join(
        F.broadcast(nat), li.l_suppkey == nat.n_nationkey
    )
    assert audit_hints(ok2) == []

    by_flag = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    ok3 = li.join(F.broadcast(by_flag), "l_returnflag")
    assert audit_hints(ok3) == []
