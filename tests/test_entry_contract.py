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
        "q_semantic_dedup",      # iterative k-means cells, planted-dup pytest
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
    checks the FIRST 50 entries of queries(). Pin the round-12 window:
    slots 1-7 are the never-driver-attested queries in the attestation
    ledger's own order (tools/attestation.py --unattested at round-12
    start — the r11 batch-9 tail plus the rows-only q_bm25_topk, the
    window's ONE rows-only slot, deliberate: the driver's weaker
    rows-only check is still its first-ever driver row); slots 8-12 are
    the round-12 additions; slots 13-50 are the 38 STALEST oracle-twinned
    greens by most-recent-attestation round (all 32 of the round-1
    cohort + the first 6 of the round-4 cohort, name order within
    cohort). The pin guards against an accidental reorder silently
    starving the gate (that is precisely what happened in round 1)."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    window = list(qs)[:50]
    # exactly one rows-only slot: q_bm25_topk's first-ever driver row
    assert [n for n in window if n not in oracles] == ["q_bm25_topk"]
    unattested_head = [
        "q_bm25_topk", "q_dedup_incremental", "q_multiset_ops",
        "q_robust_scaler", "q_rank_dependence_grid",
        "q_mixture_interleave", "q_streaming_neardup_ingest",
    ]
    assert window[:7] == unattested_head
    round12_additions = [
        "q_ivf_index_append", "q_ivf_recall_eval",
        "q_streaming_ivf_assign", "q_compact_zorder",
        "q_ivf_index_compact",
    ]
    assert window[7:12] == round12_additions
    stalest_rotation = [
        # round-1 cohort (32, name order)
        "q_date_parts", "q_distinct", "q_empty_relation", "q_except",
        "q_exists_subquery", "q_filter_isnotnull", "q_filter_isnull",
        "q_full_outer_join", "q_groupby_agg", "q_grouping_sets",
        "q_histogram", "q_in_subquery", "q_intersect",
        "q_join_project_disambiguate", "q_left_anti", "q_left_semi",
        "q_max_global", "q_null_safe_join", "q_orderby_limit", "q_pivot",
        "q_project", "q_rollup", "q_scan_parquet", "q_split_getitem",
        "q_sql_analytics", "q_sql_over_path", "q_stats_moments",
        "q_topk_per_group", "q_union_all", "q_union_missing_cols",
        "q_weighted_avg", "q_window_frame",
        # round-4 cohort head (6, name order)
        "q_array_funcs", "q_cosine_topk_ivf_exact", "q_curation_pipeline",
        "q_dedup_keep_best", "q_dedup_simhash", "q_doc_fingerprint",
    ]
    assert window[12:50] == stalest_rotation
    # the r11 window head follows the r12 one (the module-order baseline
    # under the r12 reorder is the r11 ordering, minus the slots the r12
    # window pulled forward) — every entry there is driver-green and
    # stays addressable
    assert list(qs)[50:53] == ["q_cramers_v", "q_mann_kendall",
                               "q_bowley_skew"]


def test_window_rotation_is_ledger_computed():
    """The stalest-greens fill (slots 13-50) must be COMPUTED from the
    ledger, not hand-curated: re-derive it here exactly as the window
    was built — oracle-twinned, attested, sorted by (most recent green
    round, name) — and require the window tail to be its 38-prefix.
    The derivation is pinned to the ledger AS OF round-12 composition
    (rounds <= 11): the driver writes CORRECTNESS_r12.json before the
    judge's pytest run, and the freshly-attested rows must not shift
    this round's already-shipped window."""
    from tools.attestation import load_ledger

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    ledger = load_ledger()
    stalest = sorted(
        (max(r for r in v["rounds_green"] if r <= 11), n)
        for n, v in ledger.items()
        if n in oracles and any(r <= 11 for r in v["rounds_green"])
    )
    expected = [n for _, n in stalest[:38]]
    assert list(qs)[12:50] == expected


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
