"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via the noop sink (full execution, no
driver-side collect, no sink IO cost). Round-over-round comparability:
each query gets one unmeasured warmup run (codegen + broadcast build),
then REPEATS timed runs whose MEDIAN is reported — host-contention
variance on a shared box is ±40% per single run (SURVEY.md §8), so
single-shot numbers are noise. Per-query spread (max-min of the timed
runs) is reported alongside for judging whether a delta is signal.
Set $SPARK_GRAFT_BENCH_REPEATS to override (default 3)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (  # noqa: E402
    catalog,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.session import (  # noqa: E402
    get_spark,
)

HEADLINE = [
    # relational core
    "q_star_join",
    "q_filter_join_topk",
    "q_groupby_agg",
    "q_orderby_limit",
    "q_distinct",
    "q_left_join_lookup",
    "q_window_rank",
    "q_lag_lead",
    "q_arith_derive",
    # reporting analytics
    "q_rollup",
    "q_topk_per_group",
    "q_stats_moments",
    # event-time windows + temporal joins
    "q_window_tumbling",
    "q_window_session",
    "q_asof_join",
    # training-data pipeline extensions
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_text_quality",
    "q_ngram_jaccard",
    "q_cosine_topk",
    "q_curation_pipeline",
    # round-2 additions (appended so the first 21 stay comparable to r1)
    "q_tfidf_topk",
    "q_decontaminate",
    "q_funnel_steps",
    "q_surrogate_key_fact",
    # late round-2 curation additions (appended; first 25 comparable)
    "q_pii_redact",
    "q_chunk_dedup",
    "q_sequence_pack",
    "q_cms_heavy_hitters",
    "q_profile_table_approx",
    "q_incremental_rollup",
    # round-5 additions (appended; earlier entries stay round-comparable)
    "q_outlier_zscore",
    "q_drift_chi2",
    "q_runtime_filter_join",
    "q_orc_roundtrip",
    # round-6 additions (appended): the two de-globalized sort rewrites,
    # then the new queries
    "q_percentile_rank",
    "q_ntile_cume",
    "q_retention_cohort",
    "q_zorder_layout",
    "q_minhash_jaccard_est",
    # late round-6 additions (appended; earlier entries stay comparable)
    "q_gopher_rules",
    "q_domain_cap",
    "q_bigram_lift",
    "q_mad_outlier",
    "q_fuzzy_join",
    "q_rolling_time_window",
    "q_transition_matrix",
    "q_corr_matrix",
    # round-6 session-3 additions (appended; earlier entries comparable)
    "q_linreg",
    "q_interpolate_linear",
    "q_last_touch",
    "q_table_checksum",
    # round-6 session-4 additions
    "q_linreg_group",
    "q_char_entropy",
    "q_incremental_join",
    # round-6 session-5 additions
    "q_skyline",
    "q_basket_rules",
    "q_triangle_count",
    "q_hll_incremental_distinct",
    "q_ohlc_bars",
    "q_rolling_dau",
    "q_rolling_dau_hll",
    "q_semantic_dedup",
    "q_bigram_perplexity",
    "q_zorder_pruning_stats",
    "q_cube_distinct_sketch",
    "q_scd2_asof_lookup",
    "q_vocab_coverage",
    "q_degree_distribution",
    "q_event_path_topk",
    # round-6 session-6 additions
    "q_prefix_filter_join",
    "q_token_budget_fill",
    "q_mixture_waterfill",
    "q_time_weighted_avg",
    "q_anova_f",
    "q_interval_coalesce",
    "q_scd3_merge",
    "q_tfidf_cosine_pairs",
    "q_seasonal_naive_mape",
    "q_logreg_gd",
    "q_k_anonymity",
    "q_epoch_reshard",
    "q_date_dim",
    "q_concurrency_sweep",
    "q_kcore",
    "q_hard_negatives",
    "q_negative_samples",
    "q_label_centroids",
    "q_gdpr_delete",
    "q_quarantine_split",
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def bench_skew(spark, sf_dir: str, repeats: int) -> dict:
    """Skew stress: a zipfian fact (one hot key holding half the rows)
    joined to a 50k-row dim, plain vs salted (operators/skew.salted_join).

    The fact is generated (spark.range + codegen key derivation) rather
    than scanned so the shuffle — the thing salting changes — dominates
    the measurement instead of parquet IO. Run with auto-broadcast OFF
    (the dim would otherwise broadcast at this scale and dodge the
    shuffle entirely) and AQE skew-split OFF — salting is the
    planning-time tool for exactly the cases AQE's runtime split can't
    reach; this isolates what the rewrite itself buys. 20M rows at the
    bench sf (2M on the fast sf0.01 path) put ~10M rows on the hot
    reducer unsalted vs ~625k per salt slice salted.
    """
    import statistics as _st
    import time as _t

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.skew import (
        salted_join,
    )
    from pyspark.sql import functions as F

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    big = sf.replace(".", "").isdigit() and float(sf) >= 0.1
    n = 20_000_000 if big else 2_000_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(50000)))
        .alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    dim = spark.range(50000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )

    def plain():
        return fact.join(dim, "k").groupBy("grp").agg(F.sum("v").alias("s"))

    def salted():
        return salted_join(fact, dim, ["k"]).groupBy("grp").agg(
            F.sum("v").alias("s")
        )

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    prev = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        out = {}
        for label, build in (("plain", plain), ("salted", salted)):
            materialize(build())  # warmup
            runs = []
            for _ in range(repeats):
                t0 = _t.time()
                materialize(build())
                runs.append(_t.time() - t0)
            out[label] = round(_st.median(runs), 3)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    out["ratio_plain_over_salted"] = round(out["plain"] / out["salted"], 2)
    return out


def bench_ann(spark, sf_dir: str, repeats: int) -> dict:
    """ANN ladder: exact brute force vs LSH-bucketed vs IVF-flat vs
    PQ/ADC over the embeddings table, each timed (median of ``repeats``
    post-warmup, noop sink) WITH its recall@10 against the exact result —
    a speed number without its recall is meaningless for ANN.

    PQ codebook training is timed separately (``pq_train_sec``): it's a
    build-once cost amortized over every query batch, while the ladder
    times are per-search-batch. IVF's k-means runs inside each call (its
    centroid build is part of the query path in this API), so its time is
    end-to-end — conservative for the 100 TB story, where centroids would
    be trained once and reused."""
    import statistics as _st
    import time as _t

    from pyspark.sql import functions as F

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_ivfpq,
        cosine_topk_lsh,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 32)

    out: dict = {}
    t0 = _t.time()
    books = pq_train(emb, n_sub=8, dim=64, n_centroids=16, n_iters=2)
    out["pq_train_sec"] = round(_t.time() - t0, 3)

    variants = {
        "exact": lambda: cosine_topk(emb, queries, k=10),
        # single-table LSH: the near-dup design point (recall on generic
        # top-k is poor BY CONSTRUCTION — (1-θ/π)^8 per table; the
        # recall column proves why IVF is the generic-ANN scale path)
        "lsh": lambda: cosine_topk_lsh(emb, queries, k=10),
        # OR-amplified: 8 independent tables, candidates deduped on id
        # pairs before scoring — recall ~ 1-(1-p)^8 at 8x bucket-join cost
        "lsh_x8": lambda: cosine_topk_lsh(emb, queries, k=10, n_tables=8),
        "ivf": lambda: cosine_topk_ivf(
            emb, queries, k=10, n_centroids=16, n_probe=4
        ),
        "pq": lambda: pq_topk(emb, queries, books, k=10),
        # IVFADC: cell pruning over the 8-byte codes — the
        # billion-vector configuration (recall ~= min(ivf, pq))
        "ivfpq": lambda: cosine_topk_ivfpq(
            emb, queries, books, k=10, n_centroids=16, n_probe=4
        ),
    }
    for label, build in variants.items():
        materialize(build())  # warmup
        runs = []
        for _ in range(repeats):
            t1 = _t.time()
            materialize(build())
            runs.append(_t.time() - t1)
        out[label] = round(_st.median(runs), 3)

    truth: dict = {}
    for r in variants["exact"]().collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_truth = sum(len(v) for v in truth.values())
    recall = {}
    for label in ("lsh", "lsh_x8", "ivf", "pq", "ivfpq"):
        got: dict = {}
        for r in variants[label]().collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        recall[label] = round(hits / n_truth, 3)
    out["recall_at_10"] = recall
    return out


def bench_incremental_refresh(spark, sf_dir: str, repeats: int) -> dict:
    """Incremental JOIN-view maintenance vs full recompute
    (plans/incremental.incremental_join_delta): a 20M-row generated
    fact (2M on the fast sf0.01 path) of which the last 2.5% is the
    arriving batch, joined to a 100k-row dim. ``full`` re-joins
    everything; ``delta`` joins only the batch (the maintained view
    pattern). The ratio is the point: refresh cost tracks |delta|, not
    view size — at 1000x the history the full recompute scales with
    history and the delta path doesn't. Generated (spark.range) like
    bench_skew so the join dominates, not parquet IO."""
    import statistics as _st
    import time as _t

    from pyspark.sql import functions as F

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.incremental import (
        incremental_join_delta,
    )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    big = sf.replace(".", "").isdigit() and float(sf) >= 0.1
    n = 20_000_000 if big else 2_000_000
    cut = n - n // 40  # final 2.5% is the new batch
    fact = spark.range(n).select(
        F.col("id").alias("fid"),
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("k"),
    )
    dim = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") % 9).alias("grp")
    )
    history = fact.filter(F.col("fid") < cut)
    batch = fact.filter(F.col("fid") >= cut)

    def full():
        return history.unionByName(batch).join(dim, "k")

    def delta():
        return incremental_join_delta(batch, history, None, dim, "k")

    out = {}
    for label, build in (("full_recompute", full), ("delta_refresh", delta)):
        materialize(build())  # warmup
        runs = []
        for _ in range(repeats):
            t0 = _t.time()
            materialize(build())
            runs.append(_t.time() - t0)
        out[label] = round(_st.median(runs), 3)
    out["ratio_full_over_delta"] = round(
        out["full_recompute"] / out["delta_refresh"], 2
    )
    return out


def bench_layout_pruning(spark, sf_dir: str, repeats: int) -> dict:
    """Measured data-skipping payoff of the z-order layout — the
    mechanism q_zorder_pruning_stats counts, exercised the way a
    stats-aware table format (Delta/Iceberg) uses it: per-file min/max
    stats translate the probe's band predicate into a FILE-LIST
    predicate (partition pruning on the bucket column), and the probe
    reads only surviving files. The same 2-D-keyed fact is written
    under the Morton bucketing and under single-column clustering;
    under z-order the stats exclude most files for a band on EITHER
    dimension, under linear clustering the off-dimension band excludes
    none — so the measured stats-pruned probes differ by actual IO,
    not plan shape. Generated data (bench_skew precedent), ~10% band.
    Reported per layout: files kept by the stats (hard count) and the
    median stats-pruned probe time; ratio is linear/zorder."""
    import shutil
    import statistics as _st
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    # Local wall-clock is decode-bound, not IO-bound (page cache + 32
    # cores), so the load-bearing outputs are the files_kept counts —
    # the 8x IO reduction they imply is what matters on object storage.
    n = 8_000_000 if sf_dir.rstrip("/").endswith("0.1") else 800_000
    z8 = " + ".join(
        f"shiftleft((shiftright(zx, {i}) & 1), {2 * i})"
        f" + shiftleft((shiftright(zy, {i}) & 1), {2 * i + 1})"
        for i in range(8)
    )
    base = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(256)).alias("zx"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(256)).alias("zy"),
        F.col("id").alias("payload"),
    )
    layouts = {
        "zorder": F.shiftright(F.expr(f"({z8})").cast("long"), 10),
        "linear": F.shiftright(F.col("zx"), 2).cast("long"),
    }
    lo, hi = 102, 127
    root = tempfile.mkdtemp(prefix="bench_layout_")
    out = {}
    try:
        for label, file_expr in layouts.items():
            path = f"{root}/{label}"
            (
                base.withColumn("f", file_expr)
                .repartition(64, "f")
                .write.mode("overwrite")
                .partitionBy("f")
                .parquet(path)
            )
            # the writer-side stats table: per-file min/max of the
            # probed column (what a lakehouse log records at commit)
            stats = (
                spark.read.parquet(path)
                .groupBy("f")
                .agg(F.min("zy").alias("mn"), F.max("zy").alias("mx"))
                .collect()
            )
            keep = [r["f"] for r in stats if not (r["mx"] < lo or r["mn"] > hi)]
            out[f"{label}_files_kept"] = len(keep)
            out[f"{label}_files_total"] = len(stats)
            probe = (
                spark.read.parquet(path)
                .filter(F.col("f").isin(keep))  # stats-driven pruning
                .filter((F.col("zy") >= lo) & (F.col("zy") <= hi))
                .agg(F.sum("payload"))
            )
            materialize(probe)  # warmup
            runs = []
            for _ in range(repeats):
                t0 = _t.time()
                materialize(probe)
                runs.append(_t.time() - t0)
            out[label] = round(_st.median(runs), 3)
        out["ratio_linear_over_zorder"] = round(
            out["linear"] / out["zorder"], 2
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    # global warmup: JVM JIT + parquet footer caches, not measured
    materialize(catalog.q_groupby_agg(spark, sf_dir))

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in HEADLINE:
        fn = catalog.QUERIES[name]
        materialize(fn(spark, sf_dir))  # per-query warmup, not measured
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = round(max(runs) - min(runs), 3)

    skew = bench_skew(spark, sf_dir, repeats)
    ann = bench_ann(spark, sf_dir, repeats)
    incr = bench_incremental_refresh(spark, sf_dir, repeats)
    layout = bench_layout_pruning(spark, sf_dir, repeats)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "skew_join": skew,
                "ann": ann,
                "incremental_refresh": incr,
                "layout_pruning": layout,
                "repeats": repeats,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    # compact one-line summary LAST: the driver keeps only the tail of
    # stdout, and in r6 the full JSON's size pushed the headline number
    # (printed first) out of the capture — this line always survives.
    print(
        json.dumps(
            {
                "summary": {
                    "headline_total_sec": round(sum(timings.values()), 3),
                    "n_queries": len(timings),
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "repeats": repeats,
                    "skew_ratio": skew.get("ratio_plain_over_salted"),
                    "incr_ratio": incr.get("ratio_full_over_delta"),
                    "prune_ratio": layout.get("ratio_linear_over_zorder"),
                    "ann": {
                        k: ann[k]
                        for k in ("exact", "best_approx", "recall_at_10")
                        if k in ann
                    },
                }
            }
        )
    )


if __name__ == "__main__":
    main()
