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
    checks the FIRST 50 entries of queries(). Pin the round-11 window —
    the ledger reports zero never-attested pre-round-11 queries, so
    slots 1-39 are the 39 oracle-twinned round-11 additions (the
    attestation head computed by tools/attestation.py --unattested; the
    rows-only q_bm25_topk is pinned in tests/test_round11.py), and
    slots 40-50 re-enter every ORACLE-TWINNED query whose plan or
    expression changed this round (PPJoin+ prunes, banded_id_pairs
    floor-division buckets, similarity query-batch guards, nullif
    divisor guards). The additions head fills the window exactly this
    round, so the oldest-attestation freshness rotation pauses — the
    pin still guards against an accidental reorder silently starving
    the gate (that is precisely what happened in round 1)."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    window = list(qs)[:50]
    # the round-11 window is fully oracle-twinned — zero rows-only slots
    assert [n for n in window if n not in oracles] == []
    round11_additions = [
        "q_cramers_v", "q_mann_kendall", "q_bowley_skew",
        "q_grouped_mode", "q_order_count_dispersion",
        "q_proportion_ztest", "q_split_neardup_leaks",
        "q_length_quality_grid", "q_kendall_w", "q_minmax_scale_ppm",
        "q_cohens_d", "q_wilson_ci", "q_chars_per_token_by_source",
        "q_quantile_normalization", "q_gini_split_quality",
        "q_custdist", "q_small_qty_revenue", "q_large_volume_customers",
        "q_disjunctive_revenue", "q_idle_high_balance",
        "q_waiting_suppliers", "q_volume_shipping", "q_market_share",
        "q_odds_ratio", "q_durbin_watson",
        "q_gamma_concordance", "q_cochran_q", "q_dup_ngram_coverage",
        "q_partial_corr", "q_edit_distance_dedup",
        "q_mutual_knn_pairs", "q_cross_lang_neardup", "q_doc_prefix_dup",
        "q_map_funcs",
        "q_lateral_topk", "q_month_streaks", "q_nth_value_window",
        "q_systematic_sample", "q_bitmask_rollup",
    ]
    assert window[:39] == round11_additions
    plan_change_reattest = [
        "q_prefix_filter_join", "q_ngram_jaccard", "q_dedup_yield_curve",
        "q_tfidf_cosine_pairs", "q_candidate_jaccard_hist",
        "q_cosine_topk", "q_mips_topk", "q_knn_label_vote",
        "q_hard_negatives", "q_mcnemar_test", "q_levene_quantity",
    ]
    assert window[39:50] == plan_change_reattest
    # the r9 window head follows the r11 one (the r10 reorder statement
    # was superseded; the module-order baseline under the r11 reorder is
    # the r9 ordering) — every entry there is driver-green and stays
    # addressable
    assert list(qs)[50:53] == ["q_grouped_median", "q_cohens_kappa",
                               "q_chi2_contingency"]


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
