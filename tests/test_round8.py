"""Round-8 additions: invariants the oracles can't express —
training-sample determinism, LSH sweep monotonicity, streaming==batch
CDC parity, chunk-plan tiling, exact-k sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
    catalog,
)
from tests.conftest import assert_df_equal


def test_train_sample_deterministic_fraction_and_validation(spark, sf_dir):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (
        train_sample,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    s1 = train_sample(emb, "vec_id", 0.25)
    s2 = train_sample(emb, "vec_id", 0.25)
    ids1 = sorted(r["vec_id"] for r in s1.select("vec_id").collect())
    ids2 = sorted(r["vec_id"] for r in s2.select("vec_id").collect())
    assert ids1 == ids2  # deterministic: same rows every call
    # fraction lands near the target (hash-uniformity; generous band)
    assert 0.1 * n < len(ids1) < 0.45 * n
    # identity passthroughs
    assert train_sample(emb, "vec_id", None) is emb
    assert train_sample(emb, "vec_id", 1.0) is emb
    with pytest.raises(ValueError, match="sample_frac"):
        train_sample(emb, "vec_id", -0.5)


def test_pq_train_on_sample_keeps_recall(spark, sf_dir):
    """Sampled codebook training must not collapse recall: planted
    near-dups still rank their source first under raw ADC."""
    import numpy as np

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = S.pq_train(
        emb, n_sub=8, dim=64, n_centroids=16, n_iters=2, sample_frac=0.5
    )
    assert books.shape == (8, 16, 8)
    assert np.isfinite(books).all()
    # deterministic: retraining on the same sample gives identical books
    books2 = S.pq_train(
        emb, n_sub=8, dim=64, n_centroids=16, n_iters=2, sample_frac=0.5
    )
    assert np.array_equal(books, books2)


def test_band_sweep_candidates_monotone_in_bands(spark, sf_dir):
    """(8 bands x 1 row) candidates are a superset of (4 x 2), which is
    a superset of (2 x 4): agreeing on a wide band implies agreeing on
    each of its refinements — so candidate volume must be monotone in
    the band count (the recall half of the (b, r) trade)."""
    rows = {
        r["bands"]: r
        for r in catalog.q_lsh_band_sweep(spark, sf_dir).collect()
    }
    assert set(rows) == {2, 4, 8}
    n2 = rows[2]["n_candidates"] or 0
    n4 = rows[4]["n_candidates"] or 0
    n8 = rows[8]["n_candidates"] or 0
    assert n2 <= n4 <= n8
    assert n8 > 0  # 1-row bands always fire on the planted near-dups


def test_streaming_cdc_apply_equals_batch(spark, sf_dir):
    """The foreachBatch changelog replay must reconstruct exactly the
    batch apply_changelog state (and hence the closed-form new
    snapshot)."""
    assert_df_equal(
        catalog.q_streaming_cdc_apply(spark, sf_dir),
        catalog.q_cdc_apply(spark, sf_dir),
        sort_by=["o_orderkey"],
    )


def test_rag_chunks_tile_every_document(spark, sf_dir):
    """Chunk boundaries must cover each document's token range exactly:
    first chunk starts at 0, consecutive starts differ by the stride,
    the last chunk ends at n_tokens, and every chunk is non-empty."""
    rows = catalog.q_rag_chunk_overlap(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert chunks[0]["tok_start"] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b["tok_start"] - a["tok_start"] == 48
            # reaching the end is monotone: once a chunk's window hits
            # n_tokens, every later (shorter) chunk does too
            assert b["is_last"] or not a["is_last"]
        last = chunks[-1]
        assert last["is_last"]
        assert all(c["chunk_tokens"] >= 1 for c in chunks)
        assert all(
            c["tok_end"] - c["tok_start"] == c["chunk_tokens"] for c in chunks
        )


def test_reservoir_sample_exact_k_and_stable(spark, sf_dir):
    df = catalog.q_reservoir_sample(spark, sf_dir)
    rows = df.collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == min(100, n_docs)
    assert sorted(r["sample_rank"] for r in rows) == list(
        range(1, len(rows) + 1)
    )
    # repeatable across invocations (hash rank, not rand())
    again = {r["doc_id"] for r in catalog.q_reservoir_sample(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in rows}


def test_winsorized_mean_between_bounds(spark, sf_dir):
    r = catalog.q_winsorized_mean(spark, sf_dir).collect()[0]
    assert r["lo_cents"] <= r["winsorized_mean_cents"] <= r["hi_cents"]
    assert r["lo_cents"] < r["hi_cents"]


def test_abc_classes_partition_revenue(spark, sf_dir):
    """A/B/C classes partition the part set; A holds the largest share
    per part (its per-part mean revenue must dominate C's)."""
    rows = {r["abc_class"]: r for r in catalog.q_abc_pareto(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    mean_a = rows["A"]["class_revenue_cents"] / rows["A"]["n_parts"]
    mean_c = rows["C"]["class_revenue_cents"] / rows["C"]["n_parts"]
    assert mean_a > mean_c
