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


# The 22 oracle-twinned queries whose bodies ride the r14/r15
# optimization rewrites but whose newest driver hash predated them — the
# r15 window head (r14 VERDICT item 1: the touched-query attestation
# gap). Shared between the two window tests below.
R15_TOUCHED_HEAD = [
    "q_dedup_token_savings", "q_dedup_clusters", "q_dup_cluster_size_dist",
    "q_dedup_survivorship", "q_cross_source_dups", "q_split_neardup_leaks",
    "q_leakage_safe_split", "q_local_clustering", "q_triangle_count",
    "q_cosine_topk", "q_cosine_topk_lsh", "q_knn_label_vote",
    "q_hard_negatives", "q_negative_samples", "q_ivf_recall_eval",
    "q_mips_topk", "q_ivf_index_append", "q_ivf_index_compact",
    "q_cosine_topk_ivf_indexed", "q_streaming_ivf_assign",
    "q_pagerank_exact", "q_mutual_knn_pairs",
]


def test_driver_window_composition():
    """Registry order is load-bearing: the driver's correctness gate
    checks the FIRST 50 entries of queries(). Pin the round-15 window:
    slots 1-22 are the r14/r15-TOUCHED oracle-twinned queries whose
    newest driver hash predates the optimization rewrites they ride
    (the r14 VERDICT's attestation gap: the CC dedup-cluster family,
    the graph explode rewrites, the cosine norm-hoist family, the IVF
    write family, and the r15 pagerank/mutual-kNN rewrites);
    slots 23-50 are the 28 STALEST oracle-twinned greens by
    most-recent-attestation round as of round 14, minus the head
    members (the round-5 cohort tail + the round-6 cohort head, name
    order within cohort). The pin guards against an accidental reorder
    silently starving the gate (that is precisely what happened in
    round 1). As in r13 there is NO rows-only slot: every window entry
    hash-checks."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    window = list(qs)[:50]
    assert [n for n in window if n not in oracles] == []
    assert window[:22] == R15_TOUCHED_HEAD
    stalest_rotation = [
        # round-5 cohort tail (20, name order)
        "q_resample_ffill", "q_runtime_filter_join", "q_salted_join",
        "q_scd2_merge", "q_schema_evolution", "q_sequence_pack",
        "q_sessionize", "q_streaming_dedup", "q_streaming_enrich",
        "q_streaming_session", "q_streaming_sliding", "q_streaming_tumbling",
        "q_string_agg", "q_surrogate_key_fact", "q_tfidf_topk",
        "q_try_cast", "q_unpivot", "q_window_session",
        "q_window_tumbling", "q_word_repetition",
        # round-6 cohort head (8, name order)
        "q_ab_ttest", "q_basket_rules", "q_bigram_lift",
        "q_compact_files", "q_domain_cap", "q_drift_chi2",
        "q_fuzzy_join", "q_gopher_rules",
    ]
    assert window[22:50] == stalest_rotation
    # the r13 window head follows the r15 one (the module-order baseline
    # under the r15 reorder is the r13 ordering, minus the slots the r15
    # window pulled forward) — every entry there is driver-green and
    # stays addressable
    assert list(qs)[50:53] == ["q_semantic_dedup", "q_pq_topk_lit",
                               "q_ivfpq_topk_lit"]


def test_window_rotation_is_ledger_computed():
    """The stalest-greens fill (slots 23-50) must be COMPUTED from the
    ledger, not hand-curated: re-derive it here exactly as the window
    was built — oracle-twinned, attested, sorted by (most recent green
    round, name), head members excluded — and require the window tail
    to be its 28-prefix. The derivation is pinned to the ledger AS OF
    round-15 composition (rounds <= 14, the cap tools/attestation.py
    --stalest --as-of 14 applies): the driver writes
    CORRECTNESS_r15.json before the judge's pytest run, and the
    freshly-attested rows must not shift this round's already-shipped
    window."""
    from tools.attestation import load_ledger

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    ledger = load_ledger()
    stalest = sorted(
        (max(r for r in v["rounds_green"] if r <= 14), n)
        for n, v in ledger.items()
        if n in oracles and any(r <= 14 for r in v["rounds_green"])
    )
    expected = [
        n for _, n in stalest if n not in set(R15_TOUCHED_HEAD)
    ][:28]
    assert list(qs)[22:50] == expected


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
