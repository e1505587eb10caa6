"""Round-8 batch-4 invariants the oracles can't express: weighted-median
selection semantics against a pure-Python reference, cross-correlation
pair-count geometry, burstiness band partitioning, embargo-split
conservation, heatmap share accounting, and the Zipf normalization
anchor."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)


def test_weighted_median_matches_python_reference(spark, sf_dir):
    """The two-phase running-weight crossing row must equal the
    textbook weighted median (first value whose cumulative weight
    reaches half the total under the same total order)."""
    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("long").alias("qty"),
            F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r)
    expected = {}
    for flag, rs in by_flag.items():
        rs.sort(key=lambda r: (r["cents"], r["l_orderkey"], r["l_linenumber"]))
        total = sum(r["qty"] for r in rs)
        run = 0
        for r in rs:
            run += r["qty"]
            if 2 * run >= total:
                expected[flag] = (total, r["cents"])
                break
    got = {
        r["l_returnflag"]: (r["total_qty"], r["median_price_cents"])
        for r in catalog.q_weighted_median(spark, sf_dir).collect()
    }
    assert got == expected


def test_weighted_median_one_row_per_group(spark, sf_dir):
    out = catalog.q_weighted_median(spark, sf_dir).collect()
    flags = [r["l_returnflag"] for r in out]
    assert len(flags) == len(set(flags)) == 3


def test_cross_corr_pair_count_geometry(spark, sf_dir):
    """With both daily series spanning the full day domain, the lag-L
    join has D - |L| pairs — the count must be symmetric in |lag| and
    peak at lag 0; every ccf is a correlation in [-1, 1]."""
    out = {r["lag"]: r for r in catalog.q_cross_corr(spark, sf_dir).collect()}
    assert set(out) == set(range(-7, 8))
    for lag in range(1, 8):
        assert out[lag]["n_pairs"] == out[-lag]["n_pairs"]
        assert out[lag]["n_pairs"] <= out[0]["n_pairs"]
    for r in out.values():
        assert -1.0 <= r["ccf"] <= 1.0


def test_burstiness_bands_partition_users(spark, sf_dir):
    """Band user counts must partition the active-user universe, and
    every band's event total must add back to the events table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_events = ev.count()
    out = catalog.q_burstiness(spark, sf_dir).collect()
    assert sum(r["n_users"] for r in out) == n_users
    assert sum(r["sum_events"] for r in out) == n_events
    for r in out:
        assert r["min_fano_ppm"] <= r["max_fano_ppm"]
    bands = {r["band"] for r in out}
    assert bands <= {"under", "poisson", "bursty"}


def test_embargo_split_conserves_and_orders(spark, sf_dir):
    """Splits conserve the event count, the embargo gap holds (its day
    span is < 3 days), and leakage is bounded by both marginals."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = {r["split"]: r for r in catalog.q_embargo_split(spark, sf_dir).collect()}
    assert set(out) == {"train", "embargo", "test"}
    assert sum(r["n_events"] for r in out.values()) == ev.count()
    assert out["train"]["n_leaked_users"] == 0
    assert out["embargo"]["n_leaked_users"] == 0
    leak = out["test"]["n_leaked_users"]
    assert 0 <= leak <= min(out["test"]["n_users"], out["train"]["n_users"])


def test_hour_week_heatmap_accounting(spark, sf_dir):
    """Cells cover only valid (iso_dow, hr) coordinates; event counts
    add to the table total; floor-div shares sum to within one ulp-cell
    of 1e6."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = catalog.q_hour_week_heatmap(spark, sf_dir).collect()
    assert all(1 <= r["iso_dow"] <= 7 and 0 <= r["hr"] <= 23 for r in out)
    assert sum(r["n_events"] for r in out) == ev.count()
    total_ppm = sum(r["share_ppm"] for r in out)
    assert 1_000_000 - len(out) < total_ppm <= 1_000_000


def test_repeat_rate_bounds(spark, sf_dir):
    out = catalog.q_repeat_rate(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_repeat"] <= r["n_pairs"]
        assert r["repeat_ppm"] == r["n_repeat"] * 1_000_000 // r["n_pairs"]


def test_weekly_active_overlap_bounds(spark, sf_dir):
    out = catalog.q_weekly_active_overlap(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_inter"] <= min(r["n_curr"], r["n_next"])
        assert 0.0 <= r["jaccard"] <= 1.0


def test_zipf_check_anchor_and_monotonicity(spark, sf_dir):
    """Rank 1 normalizes to exactly 1e6 ppm; frequency is non-increasing
    in rank; rf is the literal product."""
    out = sorted(
        catalog.q_zipf_check(spark, sf_dir).collect(), key=lambda r: r["rank"]
    )
    assert out[0]["rank"] == 1 and out[0]["rf_ppm"] == 1_000_000
    for a, b in zip(out, out[1:]):
        assert b["freq"] <= a["freq"]
        assert b["rank"] == a["rank"] + 1
    for r in out:
        assert r["rf"] == r["rank"] * r["freq"]
