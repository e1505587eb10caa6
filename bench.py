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
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


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

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "repeats": repeats,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
