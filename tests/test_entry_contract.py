"""Driver-contract meta-tests: __spark_entry__ exposes exactly what the
grading driver expects, and the whole catalog executes under a session
with NO engine configs (the driver builds its own plain SparkSession —
any query needing session state must set it itself)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_rows_only_queries_are_the_documented_set():
    """Every query SHOULD have an oracle; the rows-only remainder must be
    exactly the genuinely non-SQL-expressible/engine-specific set."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        # (round 2 oracle-ified the former members q_scan_csv,
        # q_write_roundtrip, q_scd1_merge, q_scd2_merge, q_partitioned_prune;
        # round 6 oracle-ified q_multimodal_features — the 16-dim stub
        # features posexplode to sha256-derived scalars DuckDB recomputes)
        "q_incremental_ingest",  # sink side-effect
        "q_streaming_running_totals",  # state-store output
        "q_approx_distinct",     # HLL sketch estimates are engine-specific
        "q_approx_percentile",   # KLL/GK sketch estimates are engine-specific
        # (q_minhash_lsh_pairs left this set in round 2: banding now
        # buckets on value vectors, reproducible in SQL)
        # (round 7 oracle-ified q_cosine_topk_lsh: seeded hyperplanes are
        # plan literals and the dot fold matches list_sum, so buckets,
        # candidates, and ranking reproduce in SQL)
        "q_cosine_topk_ivf",     # approximate, recall tested in pytest
        "q_text_model_score",    # pandas_udf transcendentals differ in ulps
        "q_profile_table_approx",  # HLL++ estimates are engine-specific
        "q_pq_topk",             # PQ codebooks from float k-means, recall pytest
        "q_ivfpq_topk",          # IVF+PQ composed, same reason as q_pq_topk
        "q_pagerank",            # iterative float power iterations, pytest
        "q_streaming_anomaly",   # state-store EW recursions, pytest vs scalar
        "q_unigram_perplexity",  # log2/pow ulps are libm-specific, pytest
        "q_bpe_train",           # iterative merge learning, pytest vs Python ref
        "q_bpe_apply",           # applies the iteratively-learned rules, same
        "q_char_entropy",        # log2 ulps are libm-specific, pytest parity
        # (round 7 oracle-ified q_dedup_clusters AND q_leakage_safe_split:
        # label propagation's fixpoint — min reachable id — is a DuckDB
        # recursive transitive closure, so both hash-check cross-engine;
        # q_split_singleton_agreement pins the singleton subset besides)
        "q_hll_incremental_distinct",  # Datasketches HLL, lossless-merge pytest
        "q_rolling_dau_hll",     # same sketch, error-envelope pytest vs exact
        # (round 13 oracle-ified q_semantic_dedup: seeded plan-literal
        # centroids — the q_ivf_recall_eval closure trick — make cell
        # argmax, centroid cosines, the within-cell pair scan and the
        # keep rule reproduce bit-for-bit in SQL; iterative k-means
        # TRAINING keeps its pytest coverage in tests/test_similarity)
        "q_bigram_perplexity",   # log2 ulps are libm-specific, pytest parity
        "q_cube_distinct_sketch",  # HLL lattice, per-cell envelope pytest
        "q_logreg_gd",           # sigmoid/log ulps are libm-specific;
        #                          layout-exactness + numpy parity pytest
        "q_kcore",               # iterative peeling, pytest vs Python ref
        "q_bm25_topk",           # ln() idf ulps are libm-specific;
        #                          ranking + 1e-9 scores pinned vs pure
        #                          Python in tests/test_round11.py
    }


def test_driver_window_composition():
    """Registry order is load-bearing: the driver's correctness gate
    checks the FIRST 50 entries of queries(). Pin the round-13 window:
    slots 1-10 are the round-13 additions/graduations (q_semantic_dedup's
    first ORACLE-TWINNED driver row — graduated from rows-only via
    seeded plan-literal centroids — the two PQ literal scoring twins,
    the full substring rung (detect + scrub + incremental + streaming
    gate + witness attribution + per-source savings readout), the
    signature-compaction loop);
    slots 11-50 are the 40 STALEST oracle-twinned greens by
    most-recent-attestation round as of round 12 (the 21 remaining
    round-4-cohort entries + the first 19 of the round-5 cohort, name
    order within cohort). The pin guards against an accidental reorder
    silently starving the gate (that is precisely what happened in
    round 1). Unlike r12 there is NO rows-only slot: every window entry
    hash-checks."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    window = list(qs)[:50]
    assert [n for n in window if n not in oracles] == []
    round13_head = [
        "q_semantic_dedup", "q_pq_topk_lit", "q_ivfpq_topk_lit",
        "q_substring_dup", "q_substring_scrub", "q_substring_incremental",
        "q_streaming_substring_ingest", "q_substring_dup_witness",
        "q_substring_savings_by_source", "q_signature_compact",
    ]
    assert window[:10] == round13_head
    stalest_rotation = [
        # round-4 cohort tail (21, name order)
        "q_doc_fingerprint_rolling", "q_embed_neardup", "q_json_extract",
        "q_lag_lead", "q_lang_id", "q_multimodal_digest",
        "q_multimodal_frames", "q_null_funcs", "q_partitioned_prune",
        "q_sample_stratified", "q_scan_csv", "q_snapshot_diff",
        "q_split_assign", "q_string_funcs", "q_text_quality",
        "q_text_term_freq", "q_text_tokens", "q_token_count_bpe",
        "q_window_rank", "q_window_sliding", "q_write_roundtrip",
        # round-5 cohort head (19, name order)
        "q_asof_join", "q_bigram_counts", "q_bucketed_join",
        "q_chunk_dedup", "q_cms_heavy_hitters", "q_date_arith",
        "q_dedup_exact", "q_dedup_minhash", "q_embed_quantize",
        "q_funnel_steps", "q_incremental_rollup", "q_json_lines_source",
        "q_minhash_lsh_pairs", "q_multimodal_chunks", "q_orc_roundtrip",
        "q_pii_redact", "q_profile_table", "q_range_join",
        "q_regex_extract",
    ]
    assert window[10:50] == stalest_rotation
    # the r12 window head follows the r13 one (the module-order baseline
    # under the r13 reorder is the r12 ordering, minus the slots the r13
    # window pulled forward) — every entry there is driver-green and
    # stays addressable
    assert list(qs)[50:53] == ["q_bm25_topk", "q_dedup_incremental",
                               "q_multiset_ops"]


def test_window_rotation_is_ledger_computed():
    """The stalest-greens fill (slots 11-50) must be COMPUTED from the
    ledger, not hand-curated: re-derive it here exactly as the window
    was built — oracle-twinned, attested, sorted by (most recent green
    round, name) — and require the window tail to be its 40-prefix.
    The derivation is pinned to the ledger AS OF round-13 composition
    (rounds <= 12, the cap tools/attestation.py --stalest --as-of 12
    applies): the driver writes CORRECTNESS_r13.json before the judge's
    pytest run, and the freshly-attested rows must not shift this
    round's already-shipped window."""
    from tools.attestation import load_ledger

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    ledger = load_ledger()
    stalest = sorted(
        (max(r for r in v["rounds_green"] if r <= 12), n)
        for n, v in ledger.items()
        if n in oracles and any(r <= 12 for r in v["rounds_green"])
    )
    expected = [n for _, n in stalest[:40]]
    assert list(qs)[10:50] == expected


def test_window_head_matches_attestation_ledger():
    """The rotation head is COMPUTED, not hand-curated (r8 VERDICT item
    9): every catalog query the driver has never attested green must sit
    inside the current window (or be rows-only, which the window
    excludes by construction)."""
    from tools.attestation import load_ledger

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    names = list(qs)
    window = set(names[:50])
    ledger = load_ledger()
    this_round_new = set(names) - set(ledger)  # no driver row exists yet
    unattested = {
        n for n in names
        if n in oracles
        and not ledger.get(n, {}).get("rounds_green")
    }
    assert unattested <= window | this_round_new, (
        sorted(unattested - window - this_round_new)
    )


def test_entry_runs_on_plain_session(spark):
    df = entry_mod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_every_query_executes(spark, sf_dir):
    """Each catalog entry returns a non-degenerate DataFrame at sf0.001.
    (Value correctness is tools/check_oracle.py's job; this guards against
    a rename/regression making the driver's harness error out.)"""
    failures = []
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            assert df.columns, f"{name}: no columns"
            df.limit(1).collect()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: {ex}")
    assert not failures, "\n".join(failures)


def test_docs_counts_in_sync():
    """SURVEY.md's claimed catalog size must match the registry — counts
    drifted by hand-editing twice in round 2; this pins them mechanically."""
    import re

    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    m = re.search(r"\((\d+) queries, (\d+) with DuckDB oracle twins", survey)
    assert m, "SURVEY.md no longer states the catalog counts"
    assert int(m.group(1)) == len(entry_mod.queries())
    assert int(m.group(2)) == len(entry_mod.oracle_sql())
    # round-delta bullets drifted twice by hand-editing ("Catalog: 131"
    # while the registry held 132, VERDICT r5): every such phrase must
    # state the CURRENT count — older bullets get rephrased as "grew to".
    counts = [int(c) for c in re.findall(r"Catalog: (\d+) queries", survey)]
    assert counts, "SURVEY.md no longer has a 'Catalog: N queries' sentence"
    assert all(c == len(entry_mod.queries()) for c in counts), counts


def test_coverage_md_lists_every_query():
    """COVERAGE.md presents itself as the operator-inventory -> queries()
    map, but ~30 round-7 queries silently never made it in (r7 VERDICT
    doc-drift item). Pin it the way SURVEY counts are pinned: every
    catalog.QUERIES key must appear in COVERAGE.md, so the drift is
    impossible to reintroduce."""
    coverage = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [k for k in entry_mod.queries() if k not in coverage]
    assert not missing, f"COVERAGE.md missing {len(missing)} queries: {missing}"


def test_rows_only_ledger_documents_every_rows_only_entry():
    """COVERAGE.md's 'Rows-only ledger' table (r12 VERDICT item 3) must
    stay in sync with the registry: every rows-only query gets a row in
    THAT section (not just a mention elsewhere), and nothing graduated
    lingers in it."""
    coverage = open(os.path.join(REPO, "COVERAGE.md")).read()
    start = coverage.index("## Rows-only ledger")
    end = coverage.index("## Scale utilities")
    section = coverage[start:end]
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    missing = [n for n in rows_only if f"`{n}`" not in section]
    assert not missing, f"ledger missing {missing}"
    # graduated entries must not keep ledger rows (the section may MENTION
    # them as graduation precedents, but not carry a `q_...` table row
    # that starts a line)
    import re
    listed = set(re.findall(r"^\| `(q_\w+)` \|", section, re.M))
    stale = listed - rows_only
    assert not stale, f"ledger lists oracle-twinned entries: {stale}"
