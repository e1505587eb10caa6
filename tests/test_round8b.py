"""Round-8 batch-3 invariants the oracles can't express: MIPS
augmentation correctness and probe/recall behavior, local-clustering on
a known graph, cross-query consistency (ACF grid vs the two-lag
autocorr), and distribution/band sanity of the new statistics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)
from tests.conftest import assert_df_equal


def test_mips_full_probe_equals_brute_force(spark, sf_dir):
    """The norm-augmentation reduction must be lossless at full probe:
    IVF over augmented vectors with n_probe == n_centroids returns
    EXACTLY the brute-force inner-product top-k (same ids, same ranks,
    same ip values — scores are computed from the original vectors)."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (
        mips_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = mips_topk(emb, queries, k=10)  # brute force path
    ivf = mips_topk(emb, queries, k=10, n_centroids=8, n_probe=8, n_iters=2)
    assert_df_equal(ivf, exact, sort_by=["query_id", "rank"])


def test_mips_partial_probe_recall(spark, sf_dir):
    """Partial probe trades recall for the probed-cell fraction but must
    stay a real retrieval: k rows per query, recall@10 above a generous
    floor against the exact set."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (
        mips_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in mips_topk(emb, queries, k=10).collect()
    }
    part = mips_topk(
        emb, queries, k=10, n_centroids=8, n_probe=2, n_iters=2
    ).collect()
    per_q = {}
    for r in part:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    hits = sum(1 for r in part if (r["query_id"], r["neighbor_id"]) in exact)
    assert hits / len(exact) > 0.3  # generous floor; bench measures real ops


def test_mips_differs_from_cosine_when_norms_vary(spark):
    """The reason MIPS is its own operator: scale one vector's length and
    it wins the inner product without winning the angle. Cosine ranking
    is scale-invariant; the dot-product ranking must flip."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (
        cosine_topk,
        mips_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # query
        (1, [0.9, 0.1, 0.0, 0.0]),       # best angle, short
        (2, [5.0, 3.0, 0.0, 0.0]),       # worse angle, long -> wins q.x
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    top_ip = mips_topk(df, q, k=1).collect()[0]["neighbor_id"]
    top_cos = cosine_topk(df, q, k=1).collect()[0]["neighbor_id"]
    assert top_ip == 2 and top_cos == 1


def test_local_clustering_known_graph(spark):
    """K3 plus a pendant edge: triangle corners have deg-2 lcc 1.0 (or
    2/3 for the corner that also carries the pendant); the pendant node
    has deg 1 and is excluded."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        local_clustering,
    )

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {r["node"]: r for r in local_clustering(edges).collect()}
    assert set(out) == {1, 2, 3}  # node 4 has deg 1
    assert out[1]["n_tri"] == 1 and out[1]["lcc"] == 1.0
    assert out[2]["n_tri"] == 1 and out[2]["lcc"] == 1.0
    assert out[3]["deg"] == 3 and out[3]["n_tri"] == 1
    assert abs(out[3]["lcc"] - 1.0 / 3.0) < 1e-15


def test_acf_grid_consistent_with_autocorr(spark, sf_dir):
    """Cross-query consistency: the one-pass lag grid must reproduce
    q_autocorr's hand-built lag-1 and lag-7 coefficients exactly (both
    reduce to the same exact power sums)."""
    grid = {
        r["lag"]: r
        for r in catalog.QUERIES["q_acf_grid"](spark, sf_dir).collect()
    }
    two = {
        r["lag"]: r
        for r in catalog.QUERIES["q_autocorr"](spark, sf_dir).collect()
    }
    for lag in (1, 7):
        assert grid[lag]["n_pairs"] == two[lag]["n_pairs"]
        assert grid[lag]["acf"] == two[lag]["autocorr"]


def test_grouped_median_matches_numpy(spark, sf_dir):
    import numpy as np

    out = {
        r["o_orderpriority"]: r
        for r in catalog.QUERIES["q_grouped_median"](spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    groups = {}
    for r in orders:
        cents = int(np.floor(r["o_totalprice"] * 100 + 0.5))
        groups.setdefault(r["o_orderpriority"], []).append(cents)
    for prio, vals in groups.items():
        assert out[prio]["n_orders"] == len(vals)
        assert out[prio]["median_cents"] == float(np.median(vals))


def test_max_drawdown_monotone_peak(spark, sf_dir):
    rows = catalog.QUERIES["q_max_drawdown"](spark, sf_dir).collect()
    prev = 0
    for r in rows:
        assert r["peak_cents"] >= prev
        assert r["peak_cents"] >= r["rev_cents"]
        assert 0.0 <= r["drawdown"] < 1.0
        prev = r["peak_cents"]


def test_ewma_dyadic_window_bounds(spark, sf_dir):
    """EWMA is a convex combination of the window's revenues: it must sit
    within [min, max] of the contributing days; full windows carry 16
    terms."""
    daily = {
        r["d"]: r["rev"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.to_date("o_orderdate").alias("d"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("rev"))
        .collect()
    }
    import datetime

    rows = catalog.QUERIES["q_ewma_dyadic"](spark, sf_dir).collect()
    # sf0.001's order calendar is sparse — full 16-day windows need not
    # exist; the per-row n_terms == |present days| check below is exact
    assert 8 <= max(r["n_terms"] for r in rows) <= 16
    for r in rows[:50]:
        d = datetime.date.fromisoformat(r["d"])
        window = [
            daily[d - datetime.timedelta(days=i)]
            for i in range(16)
            if d - datetime.timedelta(days=i) in daily
        ]
        assert len(window) == r["n_terms"]
        assert min(window) <= r["ewma_cents"] <= max(window)


def test_length_band_filter_keeps_ninety_percent(spark, sf_dir):
    rows = catalog.QUERIES["q_length_band_filter"](spark, sf_dir).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    n_kept = sum(r["n_kept"] for r in rows)
    assert 0.85 <= n_kept / n_docs <= 0.92  # (P5, P95] keeps ~90%
    for r in rows:
        assert r["band_lo"] <= r["band_hi"]


def test_cohens_kappa_bounds(spark, sf_dir):
    row = catalog.QUERIES["q_cohens_kappa"](spark, sf_dir).collect()[0]
    assert -1.0 <= row["kappa"] <= 1.0
    assert 0 <= row["diag"] <= row["n_customers"]


def test_chi2_contingency_margins(spark, sf_dir):
    """Expected counts must reproduce the observed margins: summing
    expected over a row (segment) gives that segment's observed total."""
    rows = catalog.QUERIES["q_chi2_contingency"](spark, sf_dir).collect()
    by_seg_obs, by_seg_exp = {}, {}
    for r in rows:
        by_seg_obs[r["c_mktsegment"]] = (
            by_seg_obs.get(r["c_mktsegment"], 0) + r["n_obs"]
        )
        by_seg_exp[r["c_mktsegment"]] = (
            by_seg_exp.get(r["c_mktsegment"], 0.0) + r["expected"]
        )
        assert r["chi2_term"] >= 0.0
    for seg in by_seg_obs:
        assert abs(by_seg_exp[seg] - by_seg_obs[seg]) < 1e-6 * by_seg_obs[seg]


def test_revenue_share_filter_threshold(spark, sf_dir):
    per_part = catalog.QUERIES["q_revenue_share_filter"](spark, sf_dir)
    rows = per_part.collect()
    assert rows, "scale-invariant threshold must keep a non-empty tail"
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    agg = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
            ).alias("rev")
        )
        .agg(F.sum("rev").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    for r in rows:
        assert 2 * r["rev_cents"] * agg["n"] > 3 * agg["total"]


def test_above_brand_avg_sane(spark, sf_dir):
    rows = catalog.QUERIES["q_above_brand_avg"](spark, sf_dir).collect()
    assert len(rows) == 25  # TPC-H brand domain
    for r in rows:
        assert 0 < r["n_above"] < r["n_total"]
        assert r["above_frac"] == pytest.approx(r["n_above"] / r["n_total"])


def test_knn_label_vote_shape(spark, sf_dir):
    rows = catalog.QUERIES["q_knn_label_vote"](spark, sf_dir).collect()
    assert [r["query_id"] for r in rows] == list(range(32))
    labels = {
        r["label"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label")
        .distinct()
        .collect()
    }
    for r in rows:
        assert 1 <= r["votes"] <= 10
        assert r["pred_label"] in labels
