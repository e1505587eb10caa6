"""Z-order layout tests: Morton-code correctness vs a Python reference,
and the actual data-skipping property — per-file extents stay tile-sized
in EVERY dimension, unlike a single-column sort."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.layout import (
    zorder_key,
    zorder_write,
)


def _morton_ref(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_key_matches_reference(spark):
    rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", zorder_key([F.col("a"), F.col("b")], bits=6)
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    for (a, b), z in got.items():
        assert z == _morton_ref([a, b], 6), (a, b)


def _file_extents(spark, path, cols):
    extents = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                agg = [
                    m
                    for c in cols
                    for m in (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))
                ]
                r = spark.read.parquet(os.path.join(root, f)).agg(*agg).first()
                extents.append({c: r[f"hi_{c}"] - r[f"lo_{c}"] for c in cols})
    return extents


def test_zorder_layout_bounds_extents_in_all_dims(spark, tmp_path):
    """64x64 grid into 16 files: Z-order keeps every file's x AND y extent
    tile-sized (<=31), while an x-sorted layout leaves y spanning the full
    domain (63) in every file."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )

    zpath = str(tmp_path / "zorder")
    zorder_write(grid, zpath, ["x", "y"], bits=6, n_files=16)
    z_ext = _file_extents(spark, zpath, ["x", "y"])
    assert z_ext and all(e["x"] <= 31 and e["y"] <= 31 for e in z_ext)

    lpath = str(tmp_path / "linear")
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    l_ext = _file_extents(spark, lpath, ["x", "y"])
    assert all(e["y"] == 63 for e in l_ext)  # x-sort never clusters y

    # row preservation through the z-order write
    assert spark.read.parquet(zpath).count() == 64 * 64
