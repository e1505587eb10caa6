"""Round-10 pins.

1. Banded id-window candidate generation (r9 VERDICT "What's wrong" #1):
   the block-only self-join enumerated per-block quadratic pairs on
   ~n_blocks reducer keys; banded_id_pairs rewrites it as a linear
   (block, id-bucket) equi-join. Pins: byte-identical output vs the
   naive formulation, and a plan contract that every candidate join in
   the reshaped queries keys on the bucket column, never the block alone.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
    banded_id_pairs,
)

from tests.conftest import assert_df_equal


def _naive_pairs(df, id_col, block_col, window):
    narrow = df.select(F.col(block_col).alias("blk"), F.col(id_col))
    return (
        narrow.select("blk", F.col(id_col).alias("a"))
        .join(narrow.select("blk", F.col(id_col).alias("b")), "blk")
        .filter((F.col("a") < F.col("b")) & (F.col("b") - F.col("a") <= window))
        .select("a", "b")
    )


@pytest.mark.parametrize("window", [1, 5, 100])
def test_banded_id_pairs_matches_naive(spark, sf_dir, window):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = banded_id_pairs(docs, "doc_id", "source", window)
    want = _naive_pairs(docs, "doc_id", "source", window)
    assert_df_equal(got, want)


def test_banded_id_pairs_bucket_boundary(spark):
    """Pairs straddling a bucket boundary (a div W != b div W) survive —
    the explode-to-two-buckets side of the rewrite."""
    rows = [(i, "x") for i in (0, 4, 5, 9, 10, 11, 99, 100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        (r.a, r.b)
        for r in banded_id_pairs(df, "doc_id", "source", 5).collect()
    }
    want = {
        (a, b)
        for a, _ in rows
        for b, _ in rows
        if a < b and b - a <= 5
    }
    assert got == want
    assert (9, 10) in got and (99, 100) in got  # cross-bucket pairs


def test_banded_id_pairs_rejects_bad_window(spark):
    df = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source")
    )
    with pytest.raises(ValueError):
        banded_id_pairs(df, "doc_id", "source", 0)


def _joins_of(df):
    def walk(node, out):
        if node.getClass().getSimpleName() == "Join":
            out.append(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), out)
        return out

    return walk(df._jdf.queryExecution().optimizedPlan(), [])


@pytest.mark.parametrize(
    "qname", ["q_ngram_jaccard", "q_dedup_yield_curve", "q_tfidf_cosine_pairs"]
)
def test_candidate_join_keys_include_bucket(spark, sf_dir, qname, tmp_path):
    """Plan contract: in the reshaped queries, any join whose condition
    touches the blocking column also keys on the id bucket — the
    block-only (quadratic, skewed) candidate join cannot silently return."""
    df = catalog.QUERIES[qname](spark, sf_dir)
    block_joins = 0
    for j in _joins_of(df):
        cond = j.condition()
        s = cond.get().toString() if cond.isDefined() else ""
        if "blk#" in s or "source#" in s:
            block_joins += 1
            assert "__bkt" in s, f"{qname}: block join without bucket key: {s}"
    assert block_joins >= 1, f"{qname}: expected a banded candidate join"


# -- round-10 statistics vs pure-Python references ---------------------------


def _li_rows(spark, sf_dir, cols):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(*cols).collect()


def test_mcnemar_matches_python(spark, sf_dir):
    import math

    rows = _li_rows(
        spark, sf_dir, ["l_partkey", "l_shipdate", "l_returnflag"]
    )
    per = {}
    for r in rows:
        yr = r["l_shipdate"].year
        if yr not in (1996, 1997):
            continue
        p = per.setdefault(r["l_partkey"], {"p96": 0, "p97": 0, "r96": 0, "r97": 0})
        p[f"p{yr % 100}"] = 1
        if r["l_returnflag"] == "R":
            p[f"r{yr % 100}"] = 1
    pairs = [p for p in per.values() if p["p96"] and p["p97"]]
    b = sum(1 for p in pairs if p["r96"] and not p["r97"])
    c = sum(1 for p in pairs if not p["r96"] and p["r97"])
    got = catalog.q_mcnemar_test(spark, sf_dir).collect()[0]
    assert (got["n_pairs"], got["b_96_only"], got["c_97_only"]) == (
        len(pairs), b, c,
    )
    assert got["mcnemar_chi2"] == pytest.approx((b - c) ** 2 / (b + c), abs=0)


def test_levene_matches_python(spark, sf_dir):
    rows = _li_rows(
        spark, sf_dir,
        ["l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"],
    )
    groups = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], []).append(
            (int(r["l_quantity"]), r["l_orderkey"], r["l_linenumber"])
        )
    sjs, qjs, njs = [], [], []
    for vals in groups.values():
        vals.sort()
        n = len(vals)
        m2 = vals[(n + 1) // 2 - 1][0] + vals[n // 2][0]
        zs = [abs(2 * q - m2) for q, _, _ in vals]
        njs.append(n)
        sjs.append(sum(zs))
        qjs.append(sum(z * z for z in zs))
    n_total, k = sum(njs), len(njs)
    sq_over_n = sum(s * s // n for s, n in zip(sjs, njs))
    s_tot = sum(sjs)
    ssb = sq_over_n - (s_tot * s_tot) // n_total
    ssw = sum(qjs) - sq_over_n
    got = catalog.q_levene_quantity(spark, sf_dir).collect()[0]
    assert (got["n_total"], got["k_groups"]) == (n_total, k)
    assert (got["ssb_t"], got["ssw_t"]) == (ssb, ssw)
    assert got["bf_f"] == pytest.approx(
        ((n_total - k) / (k - 1)) * (ssb / ssw), rel=1e-15
    )


def test_hellinger_terms_match_python(spark, sf_dir):
    import math

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderpriority", "o_orderdate")
        .collect()
    )
    per = {}
    for r in rows:
        yr = r["o_orderdate"].year
        if yr not in (1996, 1997):
            continue
        c = per.setdefault(r["o_orderpriority"], [0, 0])
        c[yr - 1996] += 1
    n96 = sum(v[0] for v in per.values())
    n97 = sum(v[1] for v in per.values())
    got = {
        r["o_orderpriority"]: r
        for r in catalog.q_hellinger_drift(spark, sf_dir).collect()
    }
    assert set(got) == set(per)
    for prio, (c96, c97) in per.items():
        row = got[prio]
        assert (row["c96"], row["c97"]) == (c96, c97)
        assert row["bc_term"] == pytest.approx(
            math.sqrt(c96 * c97) / math.sqrt(n96 * n97), rel=1e-15
        )


def test_backlog_conserves_and_terminates_at_zero(spark, sf_dir):
    rows = catalog.q_backlog_daily(spark, sf_dir).collect()
    assert rows[-1]["backlog"] == 0  # every opened order also closes
    assert sum(r["opened"] for r in rows) == sum(r["closed"] for r in rows)
    # cumulative identity holds row by row
    run = 0
    for r in rows:
        run += r["opened"] - r["closed"]
        assert r["backlog"] == run


def test_decile_bounds_monotone_and_match_python(spark, sf_dir):
    import math

    cents = sorted(
        (math.floor(r["o_totalprice"] * 100 + 0.5), r["o_orderkey"])
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice", "o_orderkey")
        .collect()
    )
    n = len(cents)
    want = {d: cents[(d * n) // 10 - 1][0] for d in range(1, 10)}
    got = catalog.q_order_value_decile_bounds(spark, sf_dir).collect()
    assert [r["decile"] for r in got] == list(range(1, 10))
    bounds = [r["bound_cents"] for r in got]
    assert bounds == sorted(bounds)
    assert {r["decile"]: r["bound_cents"] for r in got} == want


def test_top2_share_matches_python(spark, sf_dir):
    import math

    li = _li_rows(spark, sf_dir, ["l_suppkey", "l_extendedprice", "l_discount"])
    sup = {
        r["s_suppkey"]: r["s_nationkey"]
        for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    rev = {}
    for r in li:
        cents = (
            math.floor(r["l_extendedprice"] * 100 + 0.5)
            * (100 - math.floor(r["l_discount"] * 100 + 0.5))
        ) // 100
        rev[r["l_suppkey"]] = rev.get(r["l_suppkey"], 0) + cents
    by_nation = {}
    for sk, v in rev.items():
        by_nation.setdefault(nat[sup[sk]], []).append((v, sk))
    got = {
        r["n_name"]: r for r in catalog.q_top2_share_by_nation(spark, sf_dir).collect()
    }
    for name, vals in by_nation.items():
        vals.sort(key=lambda t: (-t[0], t[1]))
        top2 = sum(v for v, _ in vals[:2])
        tot = sum(v for v, _ in vals)
        row = got[name]
        assert (row["top2_rev_cents"], row["nation_rev_cents"]) == (top2, tot)
        assert row["top2_share_ppm"] == top2 * 1000000 // tot


def test_iqr_fences_match_python(spark, sf_dir):
    rows = _li_rows(
        spark, sf_dir,
        ["l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"],
    )
    groups = {}
    for r in rows:
        groups.setdefault(r["l_returnflag"], []).append(
            (int(r["l_quantity"]), r["l_orderkey"], r["l_linenumber"])
        )
    got = {
        r["l_returnflag"]: r
        for r in catalog.q_quantity_iqr_fences(spark, sf_dir).collect()
    }
    for flag, vals in groups.items():
        vals.sort()
        n = len(vals)
        q1 = vals[(n + 3) // 4 - 1][0]
        q3 = vals[(3 * n + 3) // 4 - 1][0]
        n_low = sum(1 for q, _, _ in vals if 2 * q < 2 * q1 - 3 * (q3 - q1))
        n_high = sum(1 for q, _, _ in vals if 2 * q > 2 * q3 + 3 * (q3 - q1))
        row = got[flag]
        assert (row["q1"], row["q3"], row["n_low"], row["n_high"]) == (
            q1, q3, n_low, n_high,
        )


def test_weekend_uplift_matches_python(spark, sf_dir):
    import math

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    we, wd = [], []
    for r in rows:
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        (we if r["o_orderdate"].weekday() >= 5 else wd).append(cents)
    got = catalog.q_weekend_uplift(spark, sf_dir).collect()[0]
    assert (got["n_we"], got["n_wd"]) == (len(we), len(wd))
    assert got["mean_weekend_cents"] == pytest.approx(
        sum(we) / len(we), rel=1e-15
    )
    assert got["mean_weekday_cents"] == pytest.approx(
        sum(wd) / len(wd), rel=1e-15
    )


def test_supplier_rank_shift_matches_python(spark, sf_dir):
    import math

    li = _li_rows(
        spark, sf_dir,
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    rev = {}
    for r in li:
        yr = r["l_shipdate"].year
        if yr not in (1996, 1997):
            continue
        u = math.floor(r["l_extendedprice"] * 100 + 0.5) * (
            100 - math.floor(r["l_discount"] * 100 + 0.5)
        )
        rev[(yr, r["l_suppkey"])] = rev.get((yr, r["l_suppkey"]), 0) + u
    ranks = {}
    for yr in (1996, 1997):
        sups = sorted(
            ((v, sk) for (y, sk), v in rev.items() if y == yr),
            key=lambda t: (-t[0], t[1]),
        )
        for i, (_, sk) in enumerate(sups):
            ranks[(yr, sk)] = i + 1
    both = [
        (abs(ranks[(1996, sk)] - ranks[(1997, sk)]),
         sk, ranks[(1996, sk)], ranks[(1997, sk)])
        for sk in {sk for (_, sk) in ranks}
        if (1996, sk) in ranks and (1997, sk) in ranks
    ]
    both.sort(key=lambda t: (-t[0], t[1]))
    want = [
        (sk, r96, r97, r96 - r97) for _, sk, r96, r97 in both[:20]
    ]
    got = [
        (r["l_suppkey"], r["r96"], r["r97"], r["rank_gain"])
        for r in catalog.q_supplier_rank_shift(spark, sf_dir).collect()
    ]
    assert got == want
