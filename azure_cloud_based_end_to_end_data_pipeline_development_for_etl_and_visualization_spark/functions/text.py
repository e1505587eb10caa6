"""Text-analysis column expressions for the ``documents`` table.

North-star extensions (SURVEY.md 2.8): tokenization, token counting,
language-ID heuristic, quality scoring, document fingerprinting, shingling.
All JVM-side built-ins — no Python UDFs in any hot path — so they run inside
whole-stage codegen and scale linearly with executors.

Cross-engine determinism (for the DuckDB oracles): tokenization is regex
``\\s+`` split of lowercased text (identical in DuckDB's
``string_split_regex``); hashes are md5-based (identical hex in both
engines), converted to integers via hex parsing — so MinHash/SimHash
signatures are *bit-identical* across engines, not just statistically alike.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny English stopword list for the language-ID heuristic
EN_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on", "with", "as",
)

#: MinHash universal-hash parameters: h_i(x) = (A_i * x + B_i) mod P.
#: P is the smallest prime > 2^32; A/B fixed so signatures are reproducible.
MINHASH_PRIME = 4294967311
MINHASH_COEFFS = [
    (1000003, 12345),
    (999331, 67891),
    (777857, 23456),
    (650011, 78912),
    (524287, 34567),
    (402653, 89123),
    (301141, 45678),
    (218971, 91234),
]


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def unique_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


#: BPE-style pre-tokenizer pattern (GPT-2-family shape: letter runs, digit
#: runs, punctuation runs, each optionally space-prefixed). Kept within the
#: common subset of Java regex and RE2 so engines agree.
BPE_PATTERN = r" ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def bpe_token_count(col: Column) -> Column:
    """Approximate LLM-token count via the BPE pre-tokenizer split —
    the budgeting signal training pipelines use (whitespace counts
    undercount punctuation-heavy text)."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_PATTERN), 0)).cast("long")


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are ascii letters or space — a
    junk-detection quality signal."""
    clean = F.length(F.regexp_replace(F.lower(col), "[^a-z ]", ""))
    return clean.cast("double") / F.length(col)


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (count includes repeats)."""
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(tokens(col), lambda t: F.array_contains(stop_arr, t)))
    return n_stop.cast("double") / F.size(tokens(col))


def lang_id(col: Column, min_overlap: int = 1) -> Column:
    """N-gram-free language-ID heuristic: 'en' when enough distinct tokens
    hit the English stoplist, else 'unk'. (A real pipeline swaps in a
    fastText-style model via pandas_udf; the Spark plumbing is identical.)"""
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    overlap = F.size(F.array_intersect(F.array_distinct(tokens(col)), stop_arr))
    return F.when(overlap >= min_overlap, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized
    (lowercased, whitespace-collapsed) text."""
    normalized = F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")
    return F.md5(normalized)


def hash32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative long — the cross-engine
    base hash for MinHash/SimHash (DuckDB: ('0x'||substr(md5(x),1,8))::bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a MATERIALIZED tokens column. Documents
    shorter than n tokens yield an empty array.

    Performance contract: ``toks`` must be a plain column reference, not the
    ``tokens(...)`` expression inline — the transform lambda reads the array
    3n times per shingle, and an inline split() would be re-evaluated each
    read (measured 11x slower at sf0.1). Project tokens in their own select
    first; Catalyst keeps the split in its own stage because CollapseProject
    refuses to duplicate non-cheap expressions."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.when(F.size(toks) >= n,
                  F.transform(idx, lambda i: F.concat_ws(
                      " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
                  ))).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles straight from a text column. Convenience form
    for small inputs/tests — hot paths should two-step via
    :func:`shingles_of` (see its performance contract)."""
    return shingles_of(tokens(col), n)


def rolling_hash(col: Column, mod: int = 2147483647) -> Column:
    """Polynomial rolling hash over the token stream:
    ``fp = ((h1*31 + h2) % m)*31 + h3 ...`` with md5-derived 32-bit token
    hashes — an order-sensitive fingerprint (md5-of-normalized-text is
    order-sensitive too but opaque; the rolling form supports incremental
    extension and windowed variants). Pure JVM higher-order aggregate,
    no UDF; the -1 sentinel reproduces reduce-without-init semantics so
    the DuckDB ``list_reduce`` oracle is bit-identical."""
    h = F.transform(tokens(col), lambda t: hash32(t))
    return F.aggregate(
        h,
        F.lit(-1).cast("long"),
        lambda acc, x: F.when(acc == -1, x).otherwise(
            (acc * 31 + x) % F.lit(mod)
        ),
    )


def minhash_exprs(shingle_hash_col: str, k: int = 8) -> list[Column]:
    """Per-shingle universal-hash columns; MIN-aggregate each to get the
    k-wide MinHash signature. Exact modular arithmetic in bigint (A*h < 2^63)."""
    h = F.col(shingle_hash_col)
    return [
        ((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:k])
    ]


#: PII patterns kept within the common Java-regex / RE2 subset so the Spark
#: expression and the DuckDB oracle match the same spans. Deliberately
#: conservative (no lookaround — RE2 has none).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"
#: North-American-style phone numbers (555-123-4567 / (555) 123 4567).
PHONE_PATTERN = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"


def redact_pii(col: Column) -> Column:
    """Scrub emails, URLs and phone numbers with typed placeholder tags —
    the standard pre-training privacy pass. Order matters: URLs first so
    an address embedded in a query string is consumed by ``<URL>`` rather
    than half-matched by the email pattern. Pure JVM ``regexp_replace``
    chain: codegen'd, linear, no shuffle."""
    out = F.regexp_replace(col, URL_PATTERN, "<URL>")
    out = F.regexp_replace(out, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(out, PHONE_PATTERN, "<PHONE>")


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-document PII span counts (for filtering policies that drop
    high-PII documents instead of redacting them)."""
    return {
        "n_urls": F.size(F.regexp_extract_all(col, F.lit(URL_PATTERN), 0)).cast("long"),
        "n_emails": F.size(
            F.regexp_extract_all(col, F.lit(EMAIL_PATTERN), 0)
        ).cast("long"),
        "n_phones": F.size(
            F.regexp_extract_all(col, F.lit(PHONE_PATTERN), 0)
        ).cast("long"),
    }
