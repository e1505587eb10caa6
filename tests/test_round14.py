"""Round-14 (optimization round) pins.

1. bench.py fault tolerance: one raising query or section must not void
   the capture — the per-query dict records ``{"err": ...}``, the
   summary line still prints LAST and machine-readably lists the
   failures (r13 VERDICT item 1: BENCH_r13.json was rc=1/parsed-null
   because one transient task failure killed the whole run).
2. Out-of-band directory swaps invalidate Spark's file-status cache:
   a DataFrame created BEFORE a compaction swap must re-list and read
   the post-swap files instead of chasing renamed ones (r13 VERDICT
   item 2 — the BENCH_r13 crash signature).
3. The r14 incremental-substring-dedup rewrite (broadcast-pruned gram
   artifact, no artifact shuffle) is output-identical to the full
   recompute restricted to the batch.
4. The fused connected-components convergence check (changed-detection
   inside the label aggregation, no per-iteration old-vs-new join)
   still converges on multi-hop chains, not just cliques.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import assert_df_equal


# ---------------------------------------------------------------------------
# 1. bench fault tolerance
# ---------------------------------------------------------------------------


def _last_json_line(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    return json.loads(lines[-1])


def test_bench_survives_failing_query_and_section(
    spark, monkeypatch, tmp_path, capsys
):
    import bench

    def boom(_spark, _sf_dir):
        raise RuntimeError("injected query fault")

    def section_boom(_spark, _sf_dir, _repeats):
        raise RuntimeError("injected section fault")

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
        catalog,
    )

    monkeypatch.setitem(catalog.QUERIES, "q_injected_fault", boom)
    monkeypatch.setattr(bench, "HEADLINE", ["q_scan_parquet", "q_injected_fault"])
    monkeypatch.setattr(bench, "bench_skew", section_boom)
    trivial = lambda _s, _d, _r: {"ok": True}  # noqa: E731
    monkeypatch.setattr(bench, "bench_ann", trivial)
    monkeypatch.setattr(bench, "bench_incremental_refresh", trivial)
    monkeypatch.setattr(bench, "bench_layout_pruning", trivial)
    monkeypatch.setattr(bench, "bench_substring_dedup", trivial)
    # redirect the BENCH_full_latest.json write (and prev read) to tmp
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "1")

    bench.main()

    out = capsys.readouterr().out
    summary = _last_json_line(out)["summary"]
    assert "q_injected_fault" in summary["errors"]
    assert "skew_join" in summary["errors"]
    assert summary["n_queries"] == 1  # q_scan_parquet still measured
    assert summary["headline_total_sec"] > 0

    full = json.load(open(tmp_path / "BENCH_full_latest.json"))
    assert isinstance(full["queries"]["q_scan_parquet"], (int, float))
    assert "injected query fault" in full["queries"]["q_injected_fault"]["err"]
    assert full["value"] > 0
    assert "injected section fault" in full["skew_join"]["err"]


def test_bench_fatal_still_prints_summary_line(monkeypatch, capsys):
    import bench

    def no_session(_name):
        raise RuntimeError("injected session fault")

    monkeypatch.setattr(bench, "get_spark", no_session)
    bench.main()
    summary = _last_json_line(capsys.readouterr().out)["summary"]
    assert "__fatal__" in summary["errors"]
    assert "injected session fault" in summary["errors"]["__fatal__"]


# ---------------------------------------------------------------------------
# 2. stale-listing invalidation after out-of-band swaps
# ---------------------------------------------------------------------------


def test_reader_survives_out_of_band_compaction_swap(spark, tmp_path):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.compact import (
        compact_parquet_dir,
        data_file_count,
        zorder_compact_dir,
    )

    path = str(tmp_path / "swap_target")
    spark.range(0, 10_000).select(
        (F.col("id") % 11).alias("x"), (F.col("id") % 7).alias("y"), "id"
    ).repartition(8).write.parquet(path)

    # read BEFORE each swap so the session's shared file-status cache
    # holds the pre-swap file names, then re-read FRESH after the swap —
    # the exact sequence whose stale listing produced the BENCH_r13
    # FileScanRDD crash (a fresh read must re-list, not chase renamed
    # part files)
    assert spark.read.parquet(path).count() == 10_000
    compact_parquet_dir(spark, path, target_mb=128)
    after = spark.read.parquet(path)
    assert after.count() == 10_000
    assert after.agg(F.sum("id")).first()[0] == 10_000 * 9_999 // 2
    assert data_file_count(path) <= 4

    # second generation: z-order compaction swaps the SAME path again
    zorder_compact_dir(spark, path, ["x", "y"], file_shift=12)
    again = spark.read.parquet(path)
    assert again.count() == 10_000
    assert again.agg(F.sum("id")).first()[0] == 10_000 * 9_999 // 2


# ---------------------------------------------------------------------------
# 3. incremental substring dedup == full recompute on the batch
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("probe", ["join", "broadcast"])
@pytest.mark.parametrize("hash_grams", [False, True])
def test_substring_incremental_matches_full(spark, hash_grams, probe):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        gram_counts,
        substring_dup_spans,
        substring_dup_spans_incremental,
    )

    boiler = " ".join(f"b{i}" for i in range(14))
    rows = [
        # base corpus: two docs sharing the boilerplate, one clean
        (0, f"x0 x1 {boiler} x2 x3"),
        (1, f"y0 {boiler} y1 y2 y3"),
        (2, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12 z13"),
        # batch: one doc repeating the base boilerplate (dup only via
        # the artifact), one with a batch-internal repeat, one clean
        (10, f"q0 q1 {boiler} q2"),
        (11, f"r0 {boiler} r1 {boiler}"),
        (12, "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9 s10 s11 s12 s13"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    base = docs.filter(F.col("doc_id") < 10)
    batch = docs.filter(F.col("doc_id") >= 10)

    counts = gram_counts(base, "doc_id", "text", hash_grams=hash_grams)
    inc = substring_dup_spans_incremental(
        batch, counts, "doc_id", "text", hash_grams=hash_grams, probe=probe
    )
    full = substring_dup_spans(
        docs, "doc_id", "text", hash_grams=hash_grams
    ).filter(F.col("doc_id") >= 10)
    assert_df_equal(inc, full, sort_by=["doc_id", "span_start"])
    assert inc.count() > 0  # the fixture actually exercises dup spans


def test_substring_incremental_empty_batch(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        gram_counts,
        substring_dup_spans_incremental,
    )

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(20)))], ["doc_id", "text"]
    )
    counts = gram_counts(docs, "doc_id", "text", hash_grams=True)
    empty = docs.filter(F.lit(False))
    for probe in ("join", "broadcast"):
        out = substring_dup_spans_incremental(
            empty, counts, "doc_id", "text", hash_grams=True, probe=probe
        )
        assert out.count() == 0


def test_substring_incremental_broadcast_guard(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        gram_counts,
        substring_dup_spans_incremental,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(4)],
        ["doc_id", "text"],
    )
    counts = gram_counts(docs, "doc_id", "text", hash_grams=True)
    with pytest.raises(ValueError, match="max_batch_grams"):
        substring_dup_spans_incremental(
            docs, counts, "doc_id", "text",
            hash_grams=True, probe="broadcast", max_batch_grams=3,
        ).count()


# ---------------------------------------------------------------------------
# 4. fused connected-components convergence on multi-hop chains
# ---------------------------------------------------------------------------


def test_connected_components_chain_converges(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.components import (
        connected_components,
    )

    # a 6-node path (diameter 5: needs several propagation rounds), a
    # triangle, and an isolated edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        ["a", "b"],
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()
    }
    want = {(n, 1) for n in range(1, 7)}
    want |= {(n, 10) for n in (10, 11, 12)}
    want |= {(n, 20) for n in (20, 21)}
    assert got == want
