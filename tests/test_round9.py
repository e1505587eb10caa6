"""Round-9 invariants beyond the DuckDB oracles: pure-Python references
for the rank statistics, conservation/monotonicity checks for the
curation readouts, and plan pins for the new join shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- rank statistics vs pure-Python references ------------------------------


def test_mann_whitney_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
                F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "c_mktsegment", "o_totalprice")
        .collect()
    )
    import math

    pooled = sorted(
        (math.floor(r["o_totalprice"] * 100 + 0.5), r["o_orderkey"],
         r["c_mktsegment"])
        for r in rows
    )
    r_a = sum(i + 1 for i, p in enumerate(pooled) if p[2] == "BUILDING")
    n_a = sum(1 for p in pooled if p[2] == "BUILDING")
    n_b = len(pooled) - n_a
    u_a = r_a - n_a * (n_a + 1) / 2
    got = catalog.q_mann_whitney(spark, sf_dir).collect()[0]
    assert (got["n_building"], got["n_machinery"]) == (n_a, n_b)
    assert got["u_building"] == u_a
    assert got["cles"] == pytest.approx(u_a / (n_a * n_b), abs=0)


def test_runs_test_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
            ).alias("c")
        )
        .collect()
    )
    daily = sorted((r["d"], r["c"]) for r in rows)
    by_val = sorted((c, d) for d, c in daily)
    n = len(by_val)
    mids = {by_val[(n + 1) // 2 - 1][0], by_val[n // 2][0]}
    med2 = sum(mids) * 2 // len(mids) if len(mids) == 2 else 2 * mids.pop()
    signs = [1 if c * 2 > med2 else -1 for _, c in daily if c * 2 != med2]
    runs = sum(
        1 for i, s in enumerate(signs) if i == 0 or signs[i - 1] != s
    )
    got = catalog.q_runs_test(spark, sf_dir).collect()[0]
    assert got["n_runs"] == runs
    assert got["n_above"] == sum(1 for s in signs if s == 1)
    assert got["n_below"] == sum(1 for s in signs if s == -1)


def test_theil_sen_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long")
            ).alias("c")
        )
        .collect()
    )
    daily = sorted((r["d"], r["c"]) for r in rows)
    slopes = sorted(
        (
            (c2 - c1) / (d2 - d1).days,
            d1,
            d2,
        )
        for i, (d1, c1) in enumerate(daily)
        for d2, c2 in daily[i + 1:]
    )
    n = len(slopes)
    lo, hi = slopes[(n + 1) // 2 - 1][0], slopes[n // 2][0]
    got = catalog.q_theil_sen(spark, sf_dir).collect()[0]
    assert got["n_pairs"] == n
    assert got["median_slope_cents_per_day"] == pytest.approx(
        (lo + hi) / 2, rel=1e-12
    )


# -- reporting shapes --------------------------------------------------------


def test_top_supplier_is_true_argmax(spark, sf_dir):
    out = catalog.q_top_supplier(spark, sf_dir).collect()
    assert len(out) >= 1
    revs = {r["total_rev_u"] for r in out}
    assert len(revs) == 1  # every surfaced supplier carries the max


def test_late_ship_priority_is_semi_join(spark, sf_dir):
    plan = plan_of(catalog.q_late_ship_priority(spark, sf_dir))
    assert "LeftSemi" in plan
    total_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    got = catalog.q_late_ship_priority(spark, sf_dir).agg(
        F.sum("n_late_orders")
    ).collect()[0][0]
    assert 0 < got <= total_orders  # semi join can't multiply rows


def test_promo_share_bounds(spark, sf_dir):
    out = catalog.q_promo_share_monthly(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r["promo_ppm"] <= 1_000_000


def test_returned_items_pushdown_and_topk(spark, sf_dir):
    plan = plan_of(catalog.q_returned_items_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(l_returnflag,R)" in plan  # filter reached the scan


# -- temporal engagement -----------------------------------------------------


def test_dwell_time_bands_conserve_gaps(spark, sf_dir):
    ev = catalog._events(spark, sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    out = catalog.q_dwell_time_bands(spark, sf_dir).collect()
    assert sum(r["n_gaps"] for r in out) == n_events - n_users
    share = sum(r["share_ppm"] for r in out)
    assert 1_000_000 - len(out) <= share <= 1_000_000  # floor-div slack


def test_dau_wau_stickiness_bounds(spark, sf_dir):
    out = catalog.q_dau_wau_stickiness(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["dau"] <= r["wau"]  # the trailing window includes the day
        assert 0 < r["stickiness_ppm"] <= 1_000_000


def test_cold_start_first_month_is_all_first(spark, sf_dir):
    out = catalog.q_cold_start_rate(spark, sf_dir).orderBy("month").collect()
    assert out[0]["cold_start_ppm"] == 1_000_000  # everyone is new on day 1
    for r in out:
        assert r["n_first"] <= r["n_active"]


def test_user_hhi_bounds(spark, sf_dir):
    n_types = (
        catalog._events(spark, sf_dir)
        .select("event_type").distinct().count()
    )
    out = catalog.q_user_hhi(spark, sf_dir).collect()
    for r in out:
        assert 1_000_000 // n_types <= r["hhi_ppm"] <= 1_000_000


# -- graph readouts ----------------------------------------------------------


def test_assortativity_in_valid_range(spark, sf_dir):
    got = catalog.q_assortativity(spark, sf_dir).collect()[0]
    assert got["n_edges"] > 0
    assert -1.0 <= got["assortativity"] <= 1.0


def test_common_neighbors_excludes_direct_edges(spark, sf_dir):
    out = catalog.q_common_neighbors_topk(spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_of(out)
    rows = out.collect()
    assert rows == sorted(
        rows, key=lambda r: (-r["cn"], r["a"], r["b"])
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    support: dict = {}
    for items in baskets.values():
        if len(items) <= 30:
            s = sorted(items)
            for i, a in enumerate(s):
                for b in s[i + 1:]:
                    support[(a, b)] = support.get((a, b), 0) + 1
    edges = {p for p, c in support.items() if c >= 2}
    for r in rows:
        assert (r["a"], r["b"]) not in edges


# -- curation readouts -------------------------------------------------------


def test_dedup_survivorship_survivor_is_best_member(spark, sf_dir):
    clusters = {
        r["doc_id"]: r["cluster_rep"]
        for r in catalog.q_dedup_clusters(spark, sf_dir).collect()
    }
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions.text import (
        token_count,
    )

    toks = {
        r["doc_id"]: r["t"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", token_count(F.col("text")).alias("t"))
        .collect()
    }
    members: dict = {}
    for doc, rep in clusters.items():
        members.setdefault(rep, []).append(doc)
    out = catalog.q_dedup_survivorship(spark, sf_dir).collect()
    expected = {
        rep: (len(m), *min((-toks[d], d) for d in m)[1:],)
        for rep, m in members.items()
        if len(m) >= 2
    }
    got = {r["cluster_rep"]: (r["n_members"], r["survivor_id"]) for r in out}
    assert got.keys() == expected.keys()
    for rep, (n, sid) in expected.items():
        assert got[rep][0] == n
        best = max((toks[d], -d) for d in members[rep])
        assert got[rep][1] == -best[1]
        assert toks[got[rep][1]] == best[0]


def test_dedup_yield_curve_is_monotone(spark, sf_dir):
    out = catalog.q_dedup_yield_curve(spark, sf_dir).orderBy(
        "threshold_pct"
    ).collect()
    assert [r["threshold_pct"] for r in out] == [50, 60, 70, 80, 90]
    pairs = [r["n_pairs"] for r in out]
    drops = [r["n_docs_dropped"] for r in out]
    assert pairs == sorted(pairs, reverse=True)
    assert drops == sorted(drops, reverse=True)
    for r in out:
        assert r["n_docs_dropped"] <= r["n_pairs"] or r["n_pairs"] == 0


def test_vocab_coverage_curve_is_monotone(spark, sf_dir):
    out = catalog.q_vocab_coverage_curve(spark, sf_dir).orderBy(
        "n_top"
    ).collect()
    assert [r["n_top"] for r in out] == [10, 100, 1000, 10000]
    cov = [r["coverage_ppm"] for r in out]
    assert cov == sorted(cov)
    assert cov[-1] <= 1_000_000
    for r in out:
        assert r["covered_tokens"] <= r["total_tokens"]


def test_contamination_by_source_counts_probe_docs(spark, sf_dir):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions.text import (
        token_count,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_probe = docs.filter(
        (F.col("doc_id") % 25 != 0) & (token_count(F.col("text")) >= 3)
    ).count()
    out = catalog.q_contamination_by_source(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == n_probe
    for r in out:
        assert 0 <= r["contaminated_ppm"] <= 1_000_000


def test_boilerplate_ngrams_are_8_grams(spark, sf_dir):
    out = catalog.q_boilerplate_ngrams(spark, sf_dir).collect()
    assert out
    occ = [r["occurrences"] for r in out]
    assert occ == sorted(occ, reverse=True)
    for r in out:
        assert len(r["gram"].split(" ")) == 8
        assert r["n_docs"] <= r["occurrences"]


# -- batch 4 -----------------------------------------------------------------


def test_wilcoxon_matches_python(spark, sf_dir):
    import math

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .select("l_partkey", F.year("l_shipdate").alias("yr"),
                "l_extendedprice", "l_discount")
        .collect()
    )
    per: dict = {}
    for r in rows:
        rev = math.floor(r["l_extendedprice"] * 100 + 0.5) * (
            100 - math.floor(r["l_discount"] * 100 + 0.5)
        )
        a = per.setdefault(r["l_partkey"], [0, 0, 0, 0])
        if r["yr"] == 1996:
            a[0] += rev
            a[2] += 1
        else:
            a[1] += rev
            a[3] += 1
    diffs = sorted(
        (abs(v[1] - v[0]), k, v[1] - v[0])
        for k, v in per.items()
        if v[2] > 0 and v[3] > 0 and v[1] != v[0]
    )
    wp = sum(i + 1 for i, t in enumerate(diffs) if t[2] > 0)
    got = catalog.q_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    assert got["n_pairs"] == len(diffs)
    assert got["w_plus"] == wp


def test_gini_by_nation_matches_global_shape(spark, sf_dir):
    out = catalog.q_gini_by_nation(spark, sf_dir).collect()
    assert len(out) == 25
    for r in out:
        assert 0.0 <= r["gini"] < 1.0
        assert r["n_customers"] >= 1


def test_supplier_hhi_bounds(spark, sf_dir):
    out = catalog.q_supplier_hhi_by_nation(spark, sf_dir).collect()
    for r in out:
        # >= 1e6/n (perfect equality) modulo the two-step floor; <= 1e6
        assert r["hhi_ppm"] <= 1_000_000
        assert r["hhi_ppm"] >= 1_000_000 // r["n_suppliers"] - 1


def test_price_dispersion_is_topk_plan(spark, sf_dir):
    df = catalog.q_price_dispersion_topk(spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_of(df)
    rows = df.collect()
    ppm = [r["rv_ppm"] for r in rows]
    assert ppm == sorted(ppm, reverse=True)
    assert all(p >= 0 for p in ppm)


def test_split_balance_conserves_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = catalog.q_split_balance_check(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    src_counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    shares = {"train": 900, "val": 50, "test": 50}
    for r in out:  # a small source may have no docs in some split —
        #            only observed (source, split) rows surface
        assert r["expected_x1000"] == src_counts[r["source"]] * shares[r["split"]]
        assert r["deviation_ppm"] >= 0


def test_ma_crossover_alternates(spark, sf_dir):
    out = catalog.q_ma_crossover(spark, sf_dir).collect()
    assert out  # seven years of dailies cross at least once
    kinds = [r["cross"] for r in out]
    for a, b in zip(kinds, kinds[1:]):
        assert a != b  # consecutive crossings must alternate direction


def test_promo_share_uses_two_level_long_partials(spark, sf_dir):
    """The monthly sums must ride the fastagg discipline: LONG partials
    per (month, input partition) in codegen, decimal merge over the
    tiny stage-2 relation — never per-row decimal accumulation."""
    plan = plan_of(catalog.q_promo_share_monthly(spark, sf_dir))
    assert "SPARK_PARTITION_ID" in plan.upper()
    # stage-1 partials are longs; the only decimal sums take stage-1
    # long outputs as input (cast(__pl/__tl as decimal))
    assert "sum(cast(__pl" in plan or "sum(cast(__pl#" in plan.replace(" ", "")


# -- batch 5 -----------------------------------------------------------------


def test_diff_in_diff_identity(spark, sf_dir):
    """DiD must equal the four cell means combined — and the cells must
    partition the filtered fact exactly."""
    got = catalog.q_diff_in_diff(spark, sf_dir).collect()[0]
    did = (got["mean_t_post"] - got["mean_t_pre"]) - (
        got["mean_c_post"] - got["mean_c_pre"]
    )
    assert got["did_cents"] == did
    n_total = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .count()
    )
    assert (
        got["n_t_pre"] + got["n_t_post"] + got["n_c_pre"] + got["n_c_post"]
        == n_total
    )


def test_langid_confusion_partitions_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = catalog.q_langid_confusion(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    per_lang: dict = {}
    for r in out:
        per_lang.setdefault(r["lang"], 0)
        per_lang[r["lang"]] += r["share_ppm"]
    for lang, tot in per_lang.items():  # floor-div slack per cell
        assert 1_000_000 - 2 <= tot <= 1_000_000


def test_dedup_token_savings_consistent_with_survivorship(spark, sf_dir):
    savings = catalog.q_dedup_token_savings(spark, sf_dir).collect()
    assert sum(r["dropped_tokens"] for r in savings) > 0
    for r in savings:
        assert 0 <= r["dropped_tokens"] <= r["total_tokens"]
        assert 0 <= r["savings_ppm"] <= 1_000_000


# -- batch 6 -----------------------------------------------------------------


def test_tv_drift_bounds(spark, sf_dir):
    got = catalog.q_tv_drift(spark, sf_dir).collect()[0]
    assert 0 <= got["tv_ppm"] <= 1_000_000  # TV distance is in [0, 1]
    assert got["n96"] > 0 and got["n97"] > 0


def test_ship_latency_shares_sum_per_priority(spark, sf_dir):
    out = catalog.q_ship_latency_bands(spark, sf_dir).collect()
    per: dict = {}
    for r in out:
        per.setdefault(r["o_orderpriority"], [0, 0])
        per[r["o_orderpriority"]][0] += r["share_ppm"]
        per[r["o_orderpriority"]][1] += 1
    for prio, (tot, ncells) in per.items():
        assert 1_000_000 - ncells <= tot <= 1_000_000  # floor-div slack


def test_reorder_interval_matches_python(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("d"))
        .collect()
    )
    per: dict = {}
    for r in rows:
        per.setdefault(r["o_custkey"], []).append((r["d"], r["o_orderkey"]))
    gaps = []
    for k, lst in per.items():
        lst.sort()
        for (d1, k1), (d2, k2) in zip(lst, lst[1:]):
            gaps.append(((d2 - d1).days, k, k2))
    gaps.sort()
    n = len(gaps)
    lo, hi = gaps[(n + 1) // 2 - 1][0], gaps[n // 2][0]
    got = catalog.q_reorder_interval_median(spark, sf_dir).collect()[0]
    assert got["n_gaps"] == n
    assert got["median_gap_days"] == (lo + hi) / 2


def test_first_vs_repeat_partitions_orders(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = catalog.q_first_vs_repeat_value(spark, sf_dir).collect()[0]
    assert got["n_first"] + got["n_repeat"] == orders.count()
    assert got["n_first"] == orders.select("o_custkey").distinct().count()
    assert got["repeat_uplift_cents"] == (
        got["mean_repeat_cents"] - got["mean_first_cents"]
    )
