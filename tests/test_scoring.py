"""Pandas-UDF model scoring: exactness vs the numpy formula, Arrow path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_scores_match_numpy_formula(spark, sf_dir):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        q_text_model_score,
    )
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions import (
        text as TX,
    )
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions.scoring import (
        _score_batch,
    )

    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    feats = {
        r["doc_id"]: (r["ar"], r["sr"], r["nt"])
        for r in docs.select(
            "doc_id",
            TX.alpha_ratio(F.col("text")).alias("ar"),
            TX.stopword_ratio(F.col("text")).alias("sr"),
            TX.token_count(F.col("text")).alias("nt"),
        ).collect()
    }
    got = {
        r["doc_id"]: r["model_score"]
        for r in q_text_model_score(spark, sf_dir).collect()
    }
    assert set(got) == set(feats)
    for doc_id, (ar, sr, nt) in feats.items():
        expected = _score_batch(
            np.array([ar]), np.array([sr or 0.0]), np.array([float(nt)])
        )[0]
        assert got[doc_id] == expected  # same numpy code path -> bit-equal
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_scoring_plan_uses_arrow_not_batch_python(spark, sf_dir):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        q_text_model_score,
    )

    plan = (
        q_text_model_score(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan
