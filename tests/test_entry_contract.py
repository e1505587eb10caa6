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
    }


def test_driver_window_composition():
    """Registry order is load-bearing: the driver's correctness gate
    checks the FIRST 50 entries of queries(). Pin the round-8 window —
    slots 1-11 are the round-7 rotation head (past-the-window entries
    judge-verified at both SFs in r7; driver-green here completes
    232/232 cumulative attestation for the r7 catalog), slots 12-33 are
    the round-8 additions, and slots 34-50 re-enter every query whose
    DuckDB oracle changed under the round-8 varchar-route fix (wide
    int->double now correctly rounded) plus the two de-hinted plans and
    the survival-table semantics fix — so an accidental reorder can't
    silently starve the gate (that is precisely what happened in
    round 1)."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    window = list(qs)[:50]
    # the round-8 window is fully oracle-twinned — zero rows-only slots
    assert [n for n in window if n not in oracles] == []
    rotation_head = ["q_dedup_clusters", "q_leakage_safe_split",
                     "q_tokenizer_fertility", "q_mixture_temperature",
                     "q_dataset_card", "q_cross_source_dups",
                     "q_equi_depth_histogram", "q_sax_symbols",
                     "q_join_cardinality_est", "q_lsh_recall_eval",
                     "q_price_index"]
    assert window[:11] == rotation_head
    round8 = ["q_spearman_corr", "q_kruskal_wallis", "q_roc_auc",
              "q_kendall_tau_daily", "q_herfindahl", "q_winsorized_mean",
              "q_abc_pareto", "q_mom_growth", "q_ngram_novelty",
              "q_vocab_overlap_sources", "q_rag_chunk_overlap",
              "q_reservoir_sample", "q_multimodal_dedup",
              "q_dup_cluster_size_dist", "q_fifo_match",
              "q_null_skew_join", "q_funnel_windowed",
              "q_late_arriving_dim", "q_cumulative_distinct_daily",
              "q_decile_transition", "q_lsh_band_sweep",
              "q_streaming_cdc_apply", "q_key_skew_profile",
              "q_doc_length_histogram", "q_embedding_norm_profile",
              "q_rolling_slope", "q_seasonality_strength"]
    assert window[11:38] == round8
    oracle_fix_reattest = ["q_autocorr", "q_gini", "q_ks_test",
                           "q_changepoint", "q_ab_cuped",
                           "q_survival_table", "q_linreg",
                           "q_linreg_group", "q_corr_matrix", "q_anova_f",
                           "q_target_encode_loo", "q_rfm"]
    assert window[38:50] == oracle_fix_reattest
    # the former round-7 window follows immediately — every entry in it
    # is driver-green from r7 and stays addressable
    assert list(qs)[50:54] == ["q_scd2_asof_lookup", "q_vocab_coverage",
                               "q_degree_distribution", "q_event_path_topk"]


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
