"""Distributed byte-pair-encoding merge training.

The tokenizer-training step of an LLM data pipeline: learn the top-N
BPE merge rules from a corpus. Classic BPE (Sennrich et al. 2016,
public algorithm) trains on the WORD-FREQUENCY table, not the raw
corpus — so the expensive part is exactly one distributed pass
(whitespace-split -> word counts) and every Lloyd-style iteration after
that runs over the vocabulary relation, which is bounded by distinct
word count, not corpus bytes. At 100 TB of text the corpus is scanned
once; the per-merge jobs touch a few-hundred-thousand-row table.

Spark-first shape per iteration:

* adjacent symbol pairs come from ``transform(sequence(...))`` +
  ``explode`` — pure codegen, no Python;
* the arg-max pair is a vocabulary-sized aggregate with a deterministic
  tie-break (count desc, then lexicographic), collected as ONE row
  (the HWM/centroid driver-scalar precedent);
* the merge is applied with an ``F.aggregate`` fold over each word's
  symbol array — greedy left-to-right exactly like the reference
  algorithm, still JVM-side;
* lineage is truncated with ``localCheckpoint`` every few merges so N
  merges never stack N nested fold expressions into one plan.

Cross-engine note: there is no SQL oracle — 20 data-dependent
iterations do not express in one DuckDB query — so correctness is
pinned by a pure-Python reference implementation in tests/test_bpe.py
(identical split, tie-break, and greedy application).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chars(col: Column) -> Column:
    """Split a word into its character symbols (no empty symbols)."""
    return F.filter(F.split(col, "(?!^)"), lambda x: x != F.lit(""))


def apply_merge(col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one merge rule to a symbol
    array, as a JVM-side fold: the accumulator's last symbol merges with
    the current one iff they equal (left, right). Because the merged
    symbol replaces the accumulator tail, overlapping occurrences behave
    exactly like the sequential reference ("aaa" + (a,a) -> [aa, a])."""
    merged = left + right
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-scan: lowercase whitespace tokenization ->
    (word, count). Map-side combined; everything downstream of BPE
    training reads this vocabulary-bounded relation."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _top_pair(vocab: DataFrame) -> list:
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("l"),
            F.element_at(F.col("syms"), i + 1).alias("r"),
        ),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select("wc", F.explode(pairs).alias("p"))
        .groupBy("p.l", "p.r")
        .agg(F.sum("wc").alias("c"))
        .orderBy(F.col("c").desc(), "l", "r")
        .limit(1)
        .collect()
    )


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 12,
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns [(left, right,
    pair_count)] in learned order. Stops early when the best remaining
    pair's count drops below ``min_count``."""
    vocab = (
        word_counts(docs, text_col)
        .select(chars(F.col("word")).alias("syms"), "wc")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for k in range(n_merges):
        top = _top_pair(vocab)
        if not top or top[0]["c"] < min_count:
            break
        left, right, count = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, count))
        vocab = vocab.select(
            apply_merge(F.col("syms"), left, right).alias("syms"), "wc"
        )
        if (k + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def encode_word(col: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Segment a word with an ordered merge list: the char split followed
    by one fold per learned rule, composed into a single JVM expression
    tree (rule count is small and fixed — tokenizers ship thousands of
    merges, but the expression depth here equals the merge count you
    compose; production-sized vocabularies would move the loop into a
    broadcast-joined longest-match table instead)."""
    expr = chars(col)
    for left, right, _count in merges:
        expr = apply_merge(expr, left, right)
    return expr
