"""Sequence packing: the two-phase distributed running sum must equal the
naive global-window packing on any input layout."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.packing import (
    pack_sequences,
)


def _naive(df, budget):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return df.select("doc_id", "n_tokens").withColumn("__start", start).select(
        "doc_id",
        "n_tokens",
        F.expr(f"__start div {budget}").alias("seq_id"),
        F.pmod(F.col("__start"), F.lit(budget)).cast("long").alias("seq_offset"),
    )


def test_pack_matches_naive_on_shuffled_layout(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 300)) for i in range(500)]
    rng.shuffle(rows)  # arrival order != id order
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(13)
    got = pack_sequences(df, "doc_id", "n_tokens", budget=512)
    want = _naive(df, 512)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_pack_offsets_are_contiguous(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 400), (3, 50), (4, 600), (5, 0), (6, 10)],
        ["doc_id", "n_tokens"],
    ).repartition(4)
    out = {r["doc_id"]: r for r in pack_sequences(df, "doc_id", "n_tokens", 512).collect()}
    # starts: 0, 100, 500, 550, 1150, 1150
    assert (out[1]["seq_id"], out[1]["seq_offset"]) == (0, 0)
    assert (out[2]["seq_id"], out[2]["seq_offset"]) == (0, 100)
    assert (out[3]["seq_id"], out[3]["seq_offset"]) == (0, 500)
    assert (out[4]["seq_id"], out[4]["seq_offset"]) == (1, 38)
    assert (out[5]["seq_id"], out[5]["seq_offset"]) == (2, 126)
    assert (out[6]["seq_id"], out[6]["seq_offset"]) == (2, 126)  # 0-token doc
