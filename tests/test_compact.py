"""Small-file compaction tests: file-count reduction, value preservation,
clustering restoration for row-group pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.compact import (
    compact_parquet_dir,
    data_file_count,
)


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A directory fragmented into many tiny files (64 partitions)."""
    path = str(tmp_path / "frag")
    spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    ).repartition(64).write.parquet(path)
    return path


def test_compaction_reduces_files_and_preserves_rows(spark, fragmented):
    before_files = data_file_count(fragmented)
    before = spark.read.parquet(fragmented)
    before_sum = before.agg(F.sum("id")).first()[0]
    assert before_files >= 32

    after_files = compact_parquet_dir(spark, fragmented, target_mb=128)
    assert after_files < before_files
    assert after_files <= 4  # tiny table -> ~1 file (+ layout variance)

    after = spark.read.parquet(fragmented)
    assert after.count() == 20_000
    assert after.agg(F.sum("id")).first()[0] == before_sum


def test_compaction_with_sort_restores_clustering(spark, fragmented):
    compact_parquet_dir(spark, fragmented, target_mb=1, sort_cols=["id"])
    df = spark.read.parquet(fragmented)
    assert df.count() == 20_000
    # range-partitioned layout: each file covers a disjoint id range, so
    # per-file (min, max) spans must not overlap
    import os

    from pyspark.sql import Row

    spans = []
    for root, _dirs, files in os.walk(fragmented):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                r: Row = (
                    spark.read.parquet(p)
                    .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
                    .first()
                )
                spans.append((r["lo"], r["hi"]))
    spans.sort()
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next
