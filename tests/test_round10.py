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
