"""BPE merge training (operators/bpe.py): the learned rules must match
a pure-Python reference implementation of the classic algorithm
(identical tokenization, tie-break, and greedy left-to-right merge
application), and be invariant to input layout."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.bpe import (
    apply_merge,
    chars,
    train_bpe_merges,
    word_counts,
)


def ref_bpe(texts: list[str], n_merges: int, min_count: int = 2):
    """Sequential reference: Sennrich-style BPE over word frequencies.
    Tie-break mirrors the engine: count desc, then (left, right) asc."""
    wc = Counter(
        w for t in texts for w in re.split(r"\s+", t.lower()) if w
    )
    vocab = [(list(w), c) for w, c in wc.items()]
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (left, right), count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if count < min_count:
            break
        merges.append((left, right, count))
        new_vocab = []
        for syms, c in vocab:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            new_vocab.append((out, c))
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def doc_texts(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return [r["text"] for r in df.select("text").collect()]


def test_apply_merge_overlap_is_greedy_left_to_right(spark):
    df = spark.createDataFrame([("aaa",), ("banana",)], "w string")
    out = df.select(
        apply_merge(chars(F.col("w")), "a", "a").alias("m")
    ).collect()
    assert out[0]["m"] == ["aa", "a"]
    assert out[1]["m"] == list("banana")
    out2 = df.select(
        apply_merge(chars(F.col("w")), "a", "n").alias("m")
    ).collect()
    assert out2[1]["m"] == ["b", "an", "an", "a"]


def test_chars_has_no_empty_symbols(spark):
    df = spark.createDataFrame([("hello",), ("x",)], "w string")
    rows = df.select(chars(F.col("w")).alias("s")).collect()
    assert rows[0]["s"] == list("hello")
    assert rows[1]["s"] == ["x"]


def test_word_counts_matches_python_split(spark, sf_dir, doc_texts):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["word"]: r["wc"] for r in word_counts(docs).collect()
    }
    want = Counter(
        w for t in doc_texts for w in re.split(r"\s+", t.lower()) if w
    )
    assert got == dict(want)


def test_merges_match_reference(spark, sf_dir, doc_texts):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = train_bpe_merges(docs, "text", n_merges=12, min_count=2)
    want = ref_bpe(doc_texts, 12, min_count=2)
    assert got == want


def test_merges_layout_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = train_bpe_merges(docs, "text", n_merges=6)
    shuffled = train_bpe_merges(docs.repartition(13), "text", n_merges=6)
    assert base == shuffled


def test_bpe_apply_matches_python(spark, sf_dir, doc_texts):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
        catalog,
    )

    got = {
        r["word"]: (r["wc"], r["segmented"], r["n_subwords"])
        for r in catalog.q_bpe_apply(spark, sf_dir).collect()
    }
    merges = ref_bpe(doc_texts, 8, min_count=2)
    wc = Counter(
        w for t in doc_texts for w in re.split(r"\s+", t.lower()) if w
    )
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for word, count in top:
        syms = list(word)
        for left, right, _c in merges:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        assert got[word] == (count, "|".join(syms), len(syms)), word
    assert len(got) == len(top)


def test_char_entropy_matches_python(spark, sf_dir, doc_texts):
    import math

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark import (
        catalog,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    rows = catalog.q_char_entropy(spark, sf_dir).collect()
    got = {r["doc_id"]: r for r in rows}
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    assert sorted(got) == sorted(ids)
    for doc_id in ids[:200]:
        c = Counter(texts[doc_id].lower())
        n = sum(c.values())
        ent = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        r = got[doc_id]
        assert r["n_chars"] == n
        assert r["distinct_chars"] == len(c)
        assert abs(r["entropy"] - ent) < 1e-9
        assert r["low_entropy"] == (r["entropy"] < 3.0)
