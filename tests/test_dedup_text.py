"""Tests for the dedup family and text-analysis functions — including
near-duplicate recall on synthetic perturbed documents (the driver testdata
has no true near-dups, so we manufacture them here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.functions import (
    text as TX,
)
from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators import (
    dedup as D,
)


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """12 docs: 0/1 identical, 2/3 near-dup (1 word of 12 changed),
    4/5 unrelated, rest filler."""
    base = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        (0, base),
        (1, base),
        (2, base + " today"),
        (3, base + " tonite"),
        (4, "completely different words about spark query engines and joins"),
        (5, "another unrelated document mentioning parquet files and shuffles"),
    ]
    rows += [(i, f"filler document number {i} with some extra words appended here okay") for i in range(6, 12)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_keeps_min_id(spark, near_dup_docs):
    out = D.dedup_exact_by_fingerprint(near_dup_docs, "text", "doc_id")
    rows = {r["doc_id"]: r["n_copies"] for r in out.collect()}
    assert rows[0] == 2  # docs 0 and 1 collapse, min id kept
    assert 1 not in rows
    assert out.count() == 11


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world "), (3, "hello worlds")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_minhash_identical_docs_identical_signatures(spark, near_dup_docs):
    sigs = D.minhash_signatures(near_dup_docs, "doc_id", "text").collect()
    by_id = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8)) for r in sigs}
    assert by_id[0] == by_id[1]  # identical docs
    shared = sum(a == b for a, b in zip(by_id[2], by_id[3]))
    assert shared >= 4  # near-dups agree on most hashes
    shared_unrelated = sum(a == b for a, b in zip(by_id[4], by_id[5]))
    assert shared_unrelated <= 2


def test_minhash_lsh_finds_near_dups(spark, near_dup_docs):
    pairs = D.minhash_near_duplicates(
        near_dup_docs, "doc_id", "text", threshold=0.5
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (0, 1) in found  # identical
    assert (2, 3) in found  # near-dup above threshold
    assert (4, 5) not in found  # unrelated
    jac = {(r["a"], r["b"]): r["jaccard"] for r in pairs}
    assert jac[(0, 1)] == 1.0


def test_simhash_hamming_close_for_near_dups(spark, near_dup_docs):
    sims = {r["doc_id"]: r["simhash"] for r in D.simhash(
        near_dup_docs, "doc_id", "text").collect()}
    assert sims[0] == sims[1]
    ham_near = bin(sims[2] ^ sims[3]).count("1")
    ham_far = bin(sims[4] ^ sims[5]).count("1")
    assert ham_near < ham_far
    pairs = {(r["a"], r["b"]) for r in D.simhash_near_pairs(
        D.simhash(near_dup_docs, "doc_id", "text"), "doc_id", max_hamming=3
    ).collect()}
    assert (0, 1) in pairs


def test_jaccard_pairs_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
    out = D.jaccard_pairs(df, pairs, "doc_id", "text").collect()
    # shingles: {a b c, b c d} vs {a b c, b c e} -> jaccard = 1/3
    assert abs(out[0]["jaccard"] - 1 / 3) < 1e-12


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "xyzzy plugh frobozz qux")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        TX.lang_id(F.col("text")).alias("lang"),
        TX.token_count(F.col("text")).alias("n"),
        TX.alpha_ratio(F.col("text")).alias("alpha"),
    ).collect()}
    assert out[1]["lang"] == "en"
    assert out[2]["lang"] == "unk"
    assert out[1]["n"] == 6
    assert out[1]["alpha"] == 1.0


def test_word_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(1, "one two")], ["doc_id", "text"])
    out = df.select(TX.word_shingles(F.col("text"), 3).alias("sh")).collect()
    assert out[0]["sh"] == []


def test_redact_pii_literals(spark):
    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@corp.example.co or call (555) 123-4567"),
            (1, "docs at https://ex.org/a?b=c#d then nothing sensitive"),
            (2, "u@a.io 555.123.4567 https://x.y/z all three kinds"),
            (3, "no pii here at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", TX.redact_pii(F.col("text")).alias("clean")
        ).collect()
    }
    assert out[0]["clean"] == "mail me at <EMAIL> or call <PHONE>"
    assert out[1]["clean"] == "docs at <URL> then nothing sensitive"
    assert out[2]["clean"] == "<EMAIL> <PHONE> <URL> all three kinds"
    assert out[3]["clean"] == "no pii here at all"


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(0, "a@b.io c@d.io https://e.fg 555-123-4567 x")], ["doc_id", "text"]
    )
    c = TX.pii_counts(F.col("text"))
    row = df.select(
        c["n_emails"].alias("e"), c["n_urls"].alias("u"), c["n_phones"].alias("p")
    ).collect()[0]
    assert (row["e"], row["u"], row["p"]) == (2, 1, 1)


def test_chunk_dedup_planted_duplicates(spark):
    # ten-word chunk "c0 .. c9" appears in docs 0 (chunk 0), 2 (chunk 1);
    # every other chunk is unique.
    boiler = " ".join(f"c{i}" for i in range(10))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (0, boiler + " " + uniq("a")),
            (1, uniq("b")),
            (2, uniq("d") + " " + boiler),
        ],
        ["doc_id", "text"],
    )
    out = D.chunk_dedup(df, "doc_id", "text", chunk_tokens=10)
    assert out.count() == 4  # boiler + a + b + d, nothing else
    dup = out.filter(F.col("n_copies") > 1).collect()
    assert len(dup) == 1
    assert dup[0]["n_copies"] == 2
    assert dup[0]["first_doc"] == 0 and dup[0]["first_chunk"] == 0


def test_chunk_dedup_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, "one two three"), (1, "one two three"), (2, "")],
        ["doc_id", "text"],
    )
    out = D.chunk_dedup(df, "doc_id", "text", chunk_tokens=10)
    # short docs form one sub-width chunk each; identical ones collapse
    rows = {r["first_doc"]: r["n_copies"] for r in out.collect()}
    assert rows[0] == 2 and rows[2] == 1


def test_unigram_perplexity_matches_python_reference(spark, sf_dir):
    """q_unigram_perplexity == a pure-Python add-one-smoothed unigram LM
    over the same whitespace tokens, to 1e-9 relative (log2/pow are the
    only transcendentals; everything upstream is exact counts)."""
    import math
    import re as _re

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        q_unigram_perplexity,
    )

    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll_bits"], r["ppl"])
        for r in q_unigram_perplexity(spark, sf_dir).collect()
    }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    tok = {
        r["doc_id"]: _re.split(r"\s+", r["text"].lower()) for r in docs
    }
    counts: dict[str, int] = {}
    for ts in tok.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    N, V = sum(counts.values()), len(counts)
    for doc_id, ts in tok.items():
        n = len(ts)
        nll = sum(-math.log2((counts[t] + 1) / (N + V)) for t in ts) / n
        g = got[doc_id]
        assert g[0] == n
        assert abs(g[1] - nll) < 1e-9 * max(1.0, abs(nll)), doc_id
        assert abs(g[2] - 2.0 ** nll) < 1e-9 * g[2]
    # sanity: corpus-trained LM gives finite, positive perplexities
    assert all(p > 1.0 for _, _, p in got.values())


def test_bigram_perplexity_matches_python_reference(spark, sf_dir):
    """q_bigram_perplexity == a pure-Python Jelinek-Mercer interpolated
    bigram LM (lambda=0.7, add-one unigram back-off component, first
    token unigram-only) over the same tokens, to 1e-9 relative."""
    import math
    import re as _re

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.catalog import (
        q_bigram_perplexity,
    )

    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll_bits"], r["ppl"])
        for r in q_bigram_perplexity(spark, sf_dir).collect()
    }

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    tok = {r["doc_id"]: _re.split(r"\s+", r["text"].lower()) for r in docs}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for ts in tok.values():
        for i, t in enumerate(ts):
            uni[t] = uni.get(t, 0) + 1
            if i > 0:
                big[(ts[i - 1], t)] = big.get((ts[i - 1], t), 0) + 1
    N, V = sum(uni.values()), len(uni)
    lam = 0.7
    for doc_id, ts in tok.items():
        nll = 0.0
        for i, t in enumerate(ts):
            p_u = (uni[t] + 1) / (N + V)
            if i == 0:
                p = p_u
            else:
                p = lam * big.get((ts[i - 1], t), 0) / uni[ts[i - 1]] + (
                    1 - lam
                ) * p_u
            nll += -math.log2(p)
        nll /= len(ts)
        g = got[doc_id]
        assert g[0] == len(ts)
        assert abs(g[1] - nll) < 1e-9 * max(1.0, abs(nll)), doc_id
        assert abs(g[2] - 2.0 ** nll) < 1e-9 * g[2]
    # the bigram term can only sharpen the model: corpus-level mean nll
    # should not exceed the unigram LM's by construction on real text
    assert all(p > 1.0 for _, _, p in got.values())


# ---------------------------------------------------------------------------
# prefix-filtered set-similarity join (SSJoin/PPJoin)
# ---------------------------------------------------------------------------


def _brute_force_jaccard_pairs(texts: dict[int, str], threshold: float, n: int = 3):
    """Quadratic reference: all pairs with shingle-set Jaccard >= t."""
    import re as _re

    sets = {}
    for doc_id, text in texts.items():
        toks = _re.split(r"\s+", text.lower())
        sets[doc_id] = {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            union = sets[a] | sets[b]
            if not union:
                continue
            j = len(sets[a] & sets[b]) / len(union)
            if j >= threshold:
                out[(a, b)] = j
    return out


def test_prefix_filter_matches_brute_force_on_planted_dups(spark, near_dup_docs):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in D.prefix_filter_pairs(
            near_dup_docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    texts = {r["doc_id"]: r["text"] for r in near_dup_docs.collect()}
    want = _brute_force_jaccard_pairs(texts, 0.5)
    assert set(got) == set(want)
    assert got[(0, 1)] == 1.0  # exact dups
    assert (2, 3) in got  # near-dups (1 word of 13 changed)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-12


def test_prefix_filter_complete_on_arbitrary_corpora(spark):
    """Hypothesis: the prefix-pruned candidate route loses NOTHING vs the
    quadratic all-pairs scan — the pigeonhole completeness guarantee —
    across random small-vocab corpora (tiny vocab maximizes shingle
    collisions, the adversarial case for candidate pruning) and
    thresholds."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(words, min_size=0, max_size=8).map(" ".join)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(doc, min_size=2, max_size=8),
        threshold=st.sampled_from([0.3, 0.5, 0.8]),
    )
    def run(docs, threshold):
        rows = [(i, t) for i, t in enumerate(docs) if t]
        if not rows:
            return
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in D.prefix_filter_pairs(
                df, "doc_id", "text", threshold=threshold
            ).collect()
        }
        want = _brute_force_jaccard_pairs(dict(rows), threshold)
        assert set(got) == set(want)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-12

    run()
