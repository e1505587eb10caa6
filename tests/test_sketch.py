"""Count-min sketch: overcount-only guarantee, exactness without
collisions, and cell-wise mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.sketch import (
    cms_build,
    cms_estimate,
)


def _tokens_df(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["term"])


def test_cms_never_undercounts(spark):
    import random

    rng = random.Random(11)
    words = [f"w{rng.randint(0, 40)}" for _ in range(3000)]
    df = _tokens_df(spark, words)
    sketch = cms_build(df, "term", depth=4, width=64)  # narrow -> collisions
    keys = df.distinct()
    est = {r["term"]: r["cms_count"] for r in cms_estimate(sketch, keys, "term", 4, 64).collect()}
    exact = {r["term"]: r["cnt"] for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(est[t] >= exact[t] for t in exact)


def test_cms_exact_when_wide(spark):
    df = _tokens_df(spark, ["a"] * 5 + ["b"] * 3 + ["c"])
    sketch = cms_build(df, "term", depth=4, width=4096)
    est = {r["term"]: r["cms_count"] for r in cms_estimate(sketch, df.distinct(), "term", 4, 4096).collect()}
    assert est == {"a": 5, "b": 3, "c": 1}
    # absent key estimates 0 (or a collision count; wide sketch -> 0 here)
    missing = _tokens_df(spark, ["zzz"])
    got = cms_estimate(sketch, missing, "term", 4, 4096).collect()[0]["cms_count"]
    assert got == 0


def test_cms_merges_cellwise(spark):
    words = ["x"] * 6 + ["y"] * 4 + ["z"] * 2
    whole = cms_build(_tokens_df(spark, words), "term", depth=4, width=64)
    h1 = cms_build(_tokens_df(spark, words[:5]), "term", depth=4, width=64)
    h2 = cms_build(_tokens_df(spark, words[5:]), "term", depth=4, width=64)
    merged = (
        h1.unionByName(h2)
        .groupBy("depth_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_merge_is_lossless_and_within_error(spark):
    """Incremental distinct via persisted HLL partials: (a) merging daily
    sketches agrees with a direct coarse-grain pass to within the
    sketch envelope — NOT bit-equality: Datasketches sparse->dense
    promotion points depend on how the input split into partials, so
    the estimate can move by a count or two with partition layout
    (reproduced at repartition(1..32): 397-401 for the same
    400-distinct set; the old bit-equality assertion here was a latent
    flake that fired when earlier suite tests shifted the session's
    partial-aggregation boundaries) — and (b) both estimates land
    within the published ~1.04/sqrt(2^lgK) envelope of exact."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.sketch import (
        hll_partials,
        hll_rollup,
    )

    rows = [(d, f"u{(d * 131 + i * 7) % 400}") for d in range(14) for i in range(300)]
    df = spark.createDataFrame(rows, "day int, user string").withColumn(
        "week", (F.col("day") / 7).cast("int")
    )
    daily = hll_partials(df, ["week", "day"], "user")
    merged = {
        r["week"]: r["n"]
        for r in hll_rollup(daily, ["week"], out_col="n").collect()
    }
    direct = {
        r["week"]: r["n"]
        for r in hll_rollup(
            hll_partials(df, ["week"], "user"), ["week"], out_col="n"
        ).collect()
    }
    exact = {
        r["week"]: r["n"]
        for r in df.groupBy("week").agg(F.countDistinct("user").alias("n")).collect()
    }
    assert merged.keys() == direct.keys() == exact.keys()
    for wk in exact:
        # merged and direct estimate the SAME set: both inside the
        # envelope, and within one envelope-width of each other
        assert abs(merged[wk] - exact[wk]) / exact[wk] < 0.05, (
            wk, merged[wk], exact[wk],
        )
        assert abs(direct[wk] - exact[wk]) / exact[wk] < 0.05, (
            wk, direct[wk], exact[wk],
        )
        assert abs(merged[wk] - direct[wk]) / exact[wk] < 0.05


def test_rolling_hll_tracks_exact_rolling_distinct(spark, sf_dir):
    """The sketch-weight rolling WAU must land within the HLL error
    envelope of the exact fan-out formulation, day by day."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        q_rolling_dau,
        q_rolling_dau_hll,
    )

    exact = {r["day"]: r["wau"] for r in q_rolling_dau(spark, sf_dir).collect()}
    approx = {
        r["day"].strftime("%Y-%m-%d"): r["wau_approx"]
        for r in q_rolling_dau_hll(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) / n < 0.05, (day, approx[day], n)


def test_cms_streaming_merge_equals_batch_build(spark):
    """Accumulating per-slice sketches with cms_merge must equal the
    batch-built sketch cell-for-cell in ANY merge order — the property
    that lets q_streaming_cms_topk hash against the full-corpus oracle."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.sketch import (
        cms_build,
        cms_merge,
    )

    rows = [(f"t{i % 37}",) for i in range(900)]
    df = spark.createDataFrame(rows, "term string")
    whole = cms_build(df, "term")
    slices = [
        cms_build(df.filter(F.crc32(F.col("term")) % 3 == i), "term")
        for i in range(3)
    ]
    for order in ((0, 1, 2), (2, 0, 1)):
        acc = slices[order[0]]
        for i in order[1:]:
            acc = cms_merge(acc, slices[i])
        got = {(r["depth_idx"], r["bucket"]): r["cnt"] for r in acc.collect()}
        want = {(r["depth_idx"], r["bucket"]): r["cnt"] for r in whole.collect()}
        assert got == want


def test_cube_distinct_sketch_tracks_exact_cells(spark, sf_dir):
    """Every cell of the sketch-built distinct cube — finest grain, both
    1-D margins, grand total — must land within the HLL error envelope
    of the exact COUNT(DISTINCT) for that cell."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        _events,
        q_cube_distinct_sketch,
    )

    got = {
        (r["event_type"], r["day"]): r["approx_users"]
        for r in q_cube_distinct_sketch(spark, sf_dir).collect()
    }
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    exact_rows = (
        ev.cube("event_type", "day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    exact = {
        (r["event_type"] or "ALL", r["day"] or "ALL"): r["n"]
        for r in exact_rows
    }
    assert set(got) == set(exact)
    for cell, n in exact.items():
        assert abs(got[cell] - n) / max(n, 1) < 0.05, (cell, got[cell], n)


def test_bloom_never_false_negative_and_fp_rate_sane(spark):
    """Bloom invariant: EVERY true member probes maybe_member=True (no
    false negatives, ever); false-positive rate on non-members stays
    near the (1-e^{-kn/m})^k design point, property-tested over
    arbitrary member sets."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.sketch import (
        bloom_build,
        bloom_probe,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(members=st.sets(st.integers(0, 10_000), min_size=1, max_size=60))
    def run(members):
        mdf = spark.createDataFrame([(m,) for m in sorted(members)], ["key"])
        bits = bloom_build(mdf, "key")
        probe_keys = sorted(members) + [20_000 + i for i in range(100)]
        pdf = spark.createDataFrame([(k,) for k in probe_keys], ["key"])
        got = {
            r["key"]: r["maybe_member"]
            for r in bloom_probe(bits, pdf, "key").collect()
        }
        assert all(got[m] for m in members)  # no false negatives
        fps = sum(1 for k in probe_keys if k >= 20_000 and got[k])
        assert fps <= 30  # 4 hashes, <=240/1024 bits set -> fp ~ <0.3%

    run()
