"""Round-13 pins: the rows-only graduations (seeded-literal semantic
dedup and PQ scoring twins), the exact substring-duplication rung, and
signature-artifact compaction. The DuckDB oracles already hash-check the
catalog entries cross-engine at three SFs; these tests pin the pieces
the oracle can't see — on-disk artifact fidelity, planted-span
geometry, layout independence, the engine-neutral fold contract behind
the PQ lookup tables, and the new zorder key-domain validation."""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import uuid

import numpy as np
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (  # noqa: E402
    catalog,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (  # noqa: E402
    minhash_signatures,
    substring_dup_spans,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (  # noqa: E402
    _fold_dot,
    _fold_norm,
    seeded_codebooks,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.plans.compact import (  # noqa: E402
    _side_dir,
    compact_parquet_dir,
    data_file_count,
    zorder_compact_dir,
)
from tests.conftest import assert_df_equal  # noqa: E402


def _tmp(name: str) -> str:
    return os.path.join(tempfile.gettempdir(), f"t13_{uuid.uuid4().hex}_{name}")


# ---------------------------------------------------------------------------
# substring duplication (q_substring_dup / substring_dup_spans)
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_dup_finds_planted_span_exactly(spark):
    """Two documents share exactly one 20-token run inside otherwise
    unique text; the detector must report it at the precise token
    offsets in both documents, and nothing else."""
    shared = " ".join(f"s{i}" for i in range(20))
    a_prefix = " ".join(f"a{i}" for i in range(7))
    b_prefix = " ".join(f"b{i}" for i in range(13))
    b_suffix = " ".join(f"c{i}" for i in range(5))
    rows = [
        (1, f"{a_prefix} {shared}"),
        (2, f"{b_prefix} {shared} {b_suffix}"),
        (3, " ".join(f"u{i}" for i in range(40))),  # no dups
    ]
    out = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_grams)
        for r in substring_dup_spans(
            _docs(spark, rows), "doc_id", "text", min_tokens=12
        ).collect()
    }
    # 20 shared tokens -> 9 duplicated 12-gram starts per doc
    assert out == {
        (1, 7, 26, 20, 9),
        (2, 13, 32, 20, 9),
    }


def test_substring_dup_reports_disjoint_repeats_as_separate_spans(spark):
    """Within-document repetition: a 12-token block repeated with unique
    spacer tokens between the copies. The copies' coverages never touch
    (the spacer token is not inside any duplicated >= 12-token
    substring), so each copy must surface as its OWN span — merging
    them would wrongly mark the spacer as duplicated."""
    block = " ".join(f"k{i}" for i in range(12))
    far = (1, f"{block} {' '.join(f'x{i}' for i in range(5))} {block}")
    near = (2, f"{block} y0 {block}")
    other = (3, f"{block} {' '.join(f'z{i}' for i in range(30))}")
    out = substring_dup_spans(
        _docs(spark, [far, near, other]), "doc_id", "text", min_tokens=12
    ).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.span_tokens)
        )
    # doc 1: dup-gram starts at 0 and 17 -> gap 17 > L=12 -> two spans,
    # positions 12..16 (the x spacers) correctly outside both
    assert sorted(by_doc[1]) == [(0, 11, 12), (17, 28, 12)]
    # doc 2: starts at 0 and 13 -> gap 13 > 12 -> two spans; the single
    # spacer y0 at position 12 stays uncovered
    assert sorted(by_doc[2]) == [(0, 11, 12), (13, 24, 12)]
    # doc 3 holds one block copy (duplicated ACROSS docs): one span
    assert sorted(by_doc[3]) == [(0, 11, 12)]


def test_substring_dup_overlapping_starts_merge(spark):
    """A 15-token shared run yields dup-gram starts {0..3}; consecutive
    starts (gap 1 <= L) must merge into ONE 15-token span, not four
    overlapping 12-token spans."""
    shared = " ".join(f"m{i}" for i in range(15))
    rows = [(1, shared), (2, f"q0 q1 {shared}")]
    out = substring_dup_spans(
        _docs(spark, rows), "doc_id", "text", min_tokens=12
    ).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out}
    assert got == {(1, 0, 14, 15), (2, 2, 16, 15)}


def test_substring_dup_layout_independence(spark, sf_dir):
    """The span set must be a pure function of the data — identical
    under different partitionings of the input."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = substring_dup_spans(docs.repartition(7, "doc_id"), "doc_id", "text")
    b = substring_dup_spans(docs.coalesce(1), "doc_id", "text")
    assert_df_equal(a, b)


def test_substring_dup_hash_grams_matches_exact(spark, sf_dir):
    """The 100 TB shuffle-key option (xxhash64 the gram) must produce
    the same spans as exact string grams on real data — the collision
    risk is theoretical at any testable size."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = substring_dup_spans(docs, "doc_id", "text", min_tokens=12)
    hashed = substring_dup_spans(
        docs, "doc_id", "text", min_tokens=12, hash_grams=True
    )
    assert_df_equal(exact, hashed)


def test_substring_dup_plan_shape(spark, sf_dir):
    """Scale pins: no cartesian/NLJ anywhere, no Python in the row path,
    and both windows keyed (gram / doc_id) — never unpartitioned."""
    df = catalog.q_substring_dup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# signature-artifact compaction (q_signature_compact)
# ---------------------------------------------------------------------------


def test_signature_compact_collapses_files_and_preserves_signatures(
    spark, sf_dir
):
    """Three batch appends leave >= 3 file generations in the signature
    artifact; compaction bin-packs them back while preserving every
    signature row exactly (the pair-set equality itself is the catalog
    entry's oracle hash)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = _tmp("sig_compact")
    try:
        from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions import (
            text as TX,
        )

        bucket = TX.hash32(F.col("doc_id").cast("string")) % 3
        for b in range(3):
            minhash_signatures(
                docs.filter(bucket == b), "doc_id", "text"
            ).write.mode("append").parquet(path)
        assert data_file_count(path) >= 3  # three generations landed
        before = spark.read.parquet(path).orderBy("doc_id").collect()
        n = compact_parquet_dir(spark, path, target_mb=128)
        assert n == 1, f"expected 1 compacted file, got {n}"
        assert data_file_count(path) == 1
        after = spark.read.parquet(path).orderBy("doc_id").collect()
        assert before == after
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_compact_side_dirs_are_invisible_to_partition_discovery(spark):
    """The swap protocol's tmp/old directories must be DOT-PREFIXED
    siblings: a crash mid-swap used to strand cell=N.__compact_<hex>
    dirs inside the partitioned index root, breaking partition discovery
    for every later reader (ADVICE r12). Spark ignores dot-prefixed
    entries, so a stranded side dir now costs disk, not availability."""
    sd = _side_dir("/some/table/cell=3", "__compact")
    assert os.path.basename(sd).startswith(".cell=3.__compact_")
    root = _tmp("part_root")
    try:
        df = spark.range(10).withColumn("cell", (F.col("id") % 2).cast("int"))
        df.write.partitionBy("cell").parquet(root)
        # simulate a crash-stranded side dir INSIDE the partitioned root
        stranded = os.path.join(root, ".cell=0.__compact_deadbeef")
        os.makedirs(stranded)
        spark.range(3).write.parquet(os.path.join(stranded, "junk"))
        got = spark.read.parquet(root).count()
        assert got == 10  # discovery unbroken, junk invisible
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# zorder key-domain validation (ADVICE r12)
# ---------------------------------------------------------------------------


def test_zorder_compact_rejects_negative_keys(spark):
    path = _tmp("zneg")
    try:
        spark.range(100).select(
            (F.col("id") - 50).alias("x"), F.col("id").alias("y")
        ).write.parquet(path)
        with pytest.raises(ValueError, match="negative"):
            zorder_compact_dir(spark, path, ["x", "y"])
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_zorder_compact_rejects_all_null_keys(spark):
    path = _tmp("znull")
    try:
        spark.range(100).select(
            F.lit(None).cast("long").alias("x"), F.col("id").alias("y")
        ).write.parquet(path)
        with pytest.raises(ValueError, match="all-NULL"):
            zorder_compact_dir(spark, path, ["x", "y"])
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_zorder_compact_still_works_on_valid_keys(spark):
    """The literal-maxes rewrite (cross join removed) must preserve the
    compaction contract: rows survive, layout is partitioned by zfile."""
    path = _tmp("zok")
    try:
        spark.range(4096).select(
            (F.col("id") % 64).alias("x"),
            F.floor(F.col("id") / 64).cast("long").alias("y"),
        ).write.parquet(path)
        zorder_compact_dir(spark, path, ["x", "y"], file_shift=12)
        out = spark.read.parquet(path)
        assert out.count() == 4096
        assert "zfile" in out.columns
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ---------------------------------------------------------------------------
# engine-neutral folds behind the PQ LUTs (the graduation contract)
# ---------------------------------------------------------------------------


def test_fold_dot_is_left_fold_not_blas():
    """_fold_dot must equal the explicit sequential left fold (what
    Spark's aggregate and DuckDB's list_sum compute) — np.dot's BLAS
    summation differs in the last ulp often enough to break hashes."""
    rng = np.random.default_rng(3)
    for n in (8, 16, 64):
        a, b = rng.standard_normal(n), rng.standard_normal(n)
        s = 0.0
        for x, y in zip(a, b):
            s += float(x) * float(y)
        assert _fold_dot(a, b) == s
        assert _fold_norm(a) == math.sqrt(_fold_dot(a, a))


def test_fold_dot_matches_spark_aggregate_fold(spark):
    """Python _fold_dot vs functions.vectors.dot (the JVM zip_with +
    aggregate left fold) on real embeddings: bit-identical, which is
    exactly why the driver-side PQ lookup tables are oracle-able."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions import (
        vectors as V,
    )

    rng = np.random.default_rng(11)
    c = rng.standard_normal(16)
    rows = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, v array<float>")
    lit = F.array(*[F.lit(float(x)) for x in c])
    got = {
        r.vec_id: r.d
        for r in df.select(
            "vec_id", V.dot(F.col("v"), lit).alias("d")
        ).collect()
    }
    for i, v in rows:
        assert got[i] == _fold_dot(np.array(v, dtype=np.float64), c), i


def test_seeded_codebooks_shape_and_determinism():
    a = seeded_codebooks(4, 8, 16, seed=46)
    b = seeded_codebooks(4, 8, 16, seed=46)
    assert a.shape == (4, 8, 16)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, seeded_codebooks(4, 8, 16, seed=47))


# ---------------------------------------------------------------------------
# graduated semantic dedup: seeded-literal catalog entry vs trained API
# ---------------------------------------------------------------------------


def test_semantic_dedup_lit_drops_planted_near_dup(spark):
    """The seeded-centroid catalog configuration must still DO the job:
    a planted near-identical pair (cosine ~1 > 0.93) loses its
    less-central member; unique vectors all survive."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (
        _hyperplanes,
        semantic_dedup,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal(64)
    near = base + rng.standard_normal(64) * 1e-4
    rows = [
        (0, base.astype("float32").tolist()),
        (1, near.astype("float32").tolist()),
    ] + [
        (i, rng.standard_normal(64).astype("float32").tolist())
        for i in range(2, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semantic_dedup(
        df,
        "vec_id",
        "embedding",
        threshold=0.93,
        centroids=_hyperplanes(catalog._SEMDEDUP_CELLS, 64,
                               seed=catalog._SEMDEDUP_SEED),
    )
    ids = {r.vec_id for r in kept.collect()}
    assert len(ids & {0, 1}) == 1  # exactly one of the planted pair
    assert set(range(2, 30)) <= ids  # every unique vector survives


# ---------------------------------------------------------------------------
# bench: canary-normalized round-over-round deltas (r12 VERDICT item 6)
# ---------------------------------------------------------------------------


def test_normalized_vs_prev_math_and_guards():
    import bench

    prev = {
        "sf": 0.1,
        "canary": {"anchor_sec": 0.8},
        "queries": {"q_a": 2.0, "q_b": 1.0, "q_tiny": 0.1, "q_gone": 3.0},
    }
    # host 25% slower this round (anchor 1.0 vs 0.8): q_a at 2.6s is
    # 2.6/1.25/2.0 = 1.04x normalized -> NOT a regression; q_b at 3.25s
    # is 3.25/1.25/1.0 = 2.6x -> regression; q_tiny is sub-300ms prior
    # -> skipped however bad; q_new has no prior -> skipped.
    timings = {"q_a": 2.6, "q_b": 3.25, "q_tiny": 1.0, "q_new": 9.9}
    out = bench.normalized_vs_prev(prev, timings, anchor_sec=1.0, sf=0.1)
    assert out["available"]
    assert out["anchor_ratio_vs_prev"] == 1.25
    assert [d["query"] for d in out["normalized_regressions"]] == ["q_b"]
    assert out["normalized_regressions"][0]["normalized_ratio"] == 2.6
    # cross-sf captures must not compare
    assert bench.normalized_vs_prev(prev, timings, 1.0, 0.01) == {
        "available": False
    }
    # missing anchor in prev -> unavailable, never a crash
    assert bench.normalized_vs_prev({"sf": 0.1}, timings, 1.0, 0.1) == {
        "available": False
    }


# ---------------------------------------------------------------------------
# substring scrub (q_substring_scrub / substring_scrub)
# ---------------------------------------------------------------------------


def test_substring_scrub_removes_planted_span_and_passes_through_rest(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        substring_scrub,
    )

    shared = " ".join(f"s{i}" for i in range(20))
    a_unique = " ".join(f"a{i}" for i in range(7))
    b_unique = " ".join(f"b{i}" for i in range(6))
    clean = " ".join(f"u{i}" for i in range(15))
    rows = [
        (1, f"{a_unique} {shared}"),
        (2, f"{shared} {b_unique}"),
        (3, clean),
    ]
    out = {
        r.doc_id: r
        for r in substring_scrub(
            _docs(spark, rows), "doc_id", "text", min_tokens=12
        ).collect()
    }
    # the shared 20-token run vanishes from BOTH docs (all occurrences)
    assert out[1].clean_text == a_unique
    assert out[1].n_tokens_removed == 20 and out[1].n_tokens_kept == 7
    assert out[2].clean_text == b_unique
    assert out[2].n_tokens_removed == 20 and out[2].n_tokens_kept == 6
    # a dup-free doc passes through verbatim (token-normalized)
    assert out[3].clean_text == clean
    assert out[3].n_tokens_removed == 0 and out[3].n_tokens_kept == 15


def test_substring_scrub_fully_covered_doc_empties(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        substring_scrub,
    )

    shared = " ".join(f"w{i}" for i in range(12))
    rows = [(1, shared), (2, shared), (3, "solo " + " ".join(f"v{i}" for i in range(12)))]
    out = {
        r.doc_id: r
        for r in substring_scrub(
            _docs(spark, rows), "doc_id", "text", min_tokens=12
        ).collect()
    }
    assert out[1].clean_text == "" and out[1].n_tokens_kept == 0
    assert out[2].clean_text == "" and out[2].n_tokens_kept == 0
    assert out[3].n_tokens_removed == 0


def test_pq_adc_matches_pure_python_rederivation(spark):
    """Shared-wrong-formula guard for the q_pq_topk_lit graduation: the
    cross-engine hash proves Spark == DuckDB, not that either computes
    ADC correctly. Re-derive the full pipeline — encode argmax over
    (sub-dot - half-norm), LUT folds, gather, cosine surrogate, (sim
    desc, id) ranking — in plain Python and require pq_topk's output to
    match exactly (ids/ranks) and to 0 ulp (sims, both sides fold-built
    from identical doubles)."""
    import math

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.similarity import (
        pq_topk,
    )

    rng = np.random.default_rng(17)
    n_sub, n_c, sub_dim, dim, k = 2, 4, 8, 16, 3
    books = seeded_codebooks(n_sub, n_c, sub_dim, seed=29)
    rows = [
        (i, rng.standard_normal(dim).astype("float32").tolist())
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = pq_topk(
        df, df.filter(F.col("vec_id") < 2), books, k=k, rerank=None
    ).collect()

    # pure-Python re-derivation
    vecs = {i: [float(x) for x in v] for i, v in rows}
    halfn = {
        (s, c): float(0.5 * np.dot(books[s][c], books[s][c]))
        for s in range(n_sub)
        for c in range(n_c)
    }

    def enc(v):
        codes = []
        for s in range(n_sub):
            sub = v[s * sub_dim : (s + 1) * sub_dim]
            scores = [
                _fold_dot(sub, books[s][c]) - halfn[(s, c)] for c in range(n_c)
            ]
            codes.append(scores.index(max(scores)))
        return codes

    expected = {}
    for q in (0, 1):
        qv = vecs[q]
        dlut = [
            _fold_dot(qv[s * sub_dim : (s + 1) * sub_dim], books[s][c])
            for s in range(n_sub)
            for c in range(n_c)
        ]
        nlut = [
            _fold_dot(books[s][c], books[s][c])
            for s in range(n_sub)
            for c in range(n_c)
        ]
        qn = _fold_norm(qv)
        scored = []
        for nid, nv in vecs.items():
            codes = enc(nv)
            num = 0.0
            den = 0.0
            for s in range(n_sub):
                num += dlut[s * n_c + codes[s]]
                den += nlut[s * n_c + codes[s]]
            scored.append((nid, num / (qn * math.sqrt(den))))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nid, sim) in enumerate(scored[:k], start=1):
            expected[(q, nid)] = (rank, sim)

    assert len(got) == 2 * k
    for r in got:
        exp_rank, exp_sim = expected[(r.query_id, r.neighbor_id)]
        assert r.rank == exp_rank, (r, exp_rank)
        assert r.sim == exp_sim, (r, exp_sim)


# ---------------------------------------------------------------------------
# incremental substring dedup (q_substring_incremental)
# ---------------------------------------------------------------------------


def test_substring_incremental_equals_full_recompute_on_incoming(spark, sf_dir):
    """The artifact path (base gram counts + batch-only tokenize) must
    produce exactly the full-recompute spans restricted to incoming
    docs — the semantics the oracle hash-checks, pinned here on the raw
    (unplanted) corpus too."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions import (
        text as TX,
    )
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        gram_counts,
        substring_dup_spans_incremental,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    is_inc = TX.hash32(F.col("doc_id").cast("string")) % 3 == 0
    base_counts = gram_counts(docs.filter(~is_inc), "doc_id", "text")
    inc = substring_dup_spans_incremental(
        docs.filter(is_inc), base_counts, "doc_id", "text"
    )
    full = substring_dup_spans(docs, "doc_id", "text")
    expected = full.join(
        docs.filter(is_inc).select("doc_id"), "doc_id", "left_semi"
    )
    assert_df_equal(inc, expected)


def test_gram_counts_merge_by_summation(spark, sf_dir):
    """The artifact's ingest contract: per-batch gram counts merged by
    SUMMATION equal the counts over the unioned corpus — so daily
    batches fold into the persisted artifact without any re-scan."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        gram_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        gram_counts(a, "doc_id", "text")
        .unionByName(gram_counts(b, "doc_id", "text"))
        .groupBy("gram")
        .agg(F.sum("n_occ").cast("long").alias("n_occ"))
    )
    whole = gram_counts(docs, "doc_id", "text")
    assert_df_equal(merged, whole)


def test_normalized_vs_prev_burst_detector():
    """Clustered regressions (consecutive headline positions — a load
    burst) flag burst_suspected; scattered ones don't."""
    import bench

    order = [f"q{i}" for i in range(40)]
    prev = {
        "sf": 0.1,
        "canary": {"anchor_sec": 1.0},
        "queries": {n: 1.0 for n in order},
    }
    # burst: positions 10-14 all regress
    timings = {n: 1.0 for n in order}
    for i in range(10, 15):
        timings[f"q{i}"] = 2.0
    out = bench.normalized_vs_prev(prev, timings, 1.0, 0.1, order=order)
    assert out["burst_suspected"] is True
    # scattered: positions 3, 17, 31 regress
    timings = {n: 1.0 for n in order}
    for i in (3, 17, 31):
        timings[f"q{i}"] = 2.0
    out = bench.normalized_vs_prev(prev, timings, 1.0, 0.1, order=order)
    assert out["burst_suspected"] is False


def test_substring_dup_witness_points_at_other_occurrence(spark):
    """Witness geometry: two docs share a 12-token block; each span's
    witness must point at the OTHER doc's copy (the minimal other
    site), never at itself."""
    block = " ".join(f"wb{i}" for i in range(12))
    rows = [
        (1, block),
        (2, f"z0 z1 z2 {block}"),
        (3, " ".join(f"q{i}" for i in range(25))),
    ]
    out = {
        r.doc_id: r
        for r in substring_dup_spans(
            _docs(spark, rows), "doc_id", "text", min_tokens=12, witness=True
        ).collect()
    }
    # doc 1's copy at pos 0 is the global min site -> its witness is doc 2
    assert (out[1].witness_doc, out[1].witness_pos) == (2, 3)
    # doc 2's copy witnesses the global min (doc 1, pos 0)
    assert (out[2].witness_doc, out[2].witness_pos) == (1, 0)
    assert 3 not in out


def test_substring_scrub_keeps_null_text_docs(spark):
    """A NULL-text document must not silently vanish from the scrub
    output (the posexplode reassembly would drop it without the
    coalesce guard); it passes through with empty clean_text."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.dedup import (
        substring_scrub,
    )

    rows = [(1, None), (2, " ".join(f"n{i}" for i in range(15)))]
    out = {
        r.doc_id: r
        for r in substring_scrub(
            _docs(spark, rows), "doc_id", "text", min_tokens=12
        ).collect()
    }
    assert set(out) == {1, 2}
    assert out[1].n_tokens_removed == 0
    assert out[2].n_tokens_removed == 0 and out[2].n_tokens_kept == 15
