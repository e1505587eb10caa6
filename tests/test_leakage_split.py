"""Leakage-safe split invariants (q_leakage_safe_split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)


def test_leakage_safe_split_invariants(spark, sf_dir):
    out = catalog.q_leakage_safe_split(spark, sf_dir).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.count() == docs.count()

    # 1. a cluster never straddles splits
    multi = (
        out.groupBy("cluster_rep")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert multi == 0

    # 2. every LSH near-dup pair co-locates
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        minhash_near_duplicates,
    )

    pairs = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.5)
    a = out.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    crossing = (
        pairs.join(a, "a").join(b, "b").filter(F.col("sa") != F.col("sb")).count()
    )
    assert crossing == 0
    assert pairs.count() > 0  # the scenario exercises real clusters

    # 3. singletons get exactly q_split_assign's assignment
    plain = catalog.q_split_assign(spark, sf_dir).select(
        "doc_id", F.col("split").alias("plain_split")
    )
    singles = out.filter(F.col("cluster_rep") == F.col("doc_id")).join(
        plain, "doc_id"
    )
    clustered_ids = {
        r["doc_id"]
        for r in out.filter(F.col("cluster_rep") != F.col("doc_id")).collect()
    }
    diverging = singles.filter(
        (F.col("split") != F.col("plain_split"))
        & ~F.col("doc_id").isin(list(clustered_ids) or [-1])
    ).count()
    assert diverging == 0

    # 4. split fractions are plausibly 90/5/5
    n = out.count()
    train = out.filter(F.col("split") == "train").count()
    assert 0.8 < train / n < 0.97
    out.unpersist()
