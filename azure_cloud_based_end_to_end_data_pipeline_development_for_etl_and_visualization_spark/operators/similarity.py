"""Similarity search over embedding columns (``array<float>``).

North-star extension (SURVEY.md 2.8, PAPERS.md REPOSE ICDE 2021 / EDBT 2020
top-k): brute-force cosine top-k as the exact baseline, random-hyperplane
LSH bucketing as the scale path.

Scale design: brute-force is a broadcast nested loop — correct and fine
when the query set is small (queries broadcast, corpus streamed, top-k via
per-query window). For corpus-vs-corpus at 100 TB, the LSH variant buckets
both sides by hyperplane sign bits so the join compares only same-bucket
candidates; recall is tunable via number of planes / probe tables (tested
in tests/test_similarity.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Output: (query_id, neighbor_id, rank, sim). Self-matches excluded.
    Plan: broadcast(queries) x corpus -> cosine expr (JVM, no UDF) ->
    row_number window partitioned by query."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def threshold_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, optionally
    blocked on a grouping column (cuts the pair space from n^2 to
    sum of per-block n_b^2 — the standard blocking trick)."""
    a_cols = [F.col(id_col).alias("a"), F.col(vec_col).alias("va")]
    b_cols = [F.col(id_col).alias("b"), F.col(vec_col).alias("vb")]
    if block_col:
        a = corpus.select(F.col(block_col).alias("blk"), *a_cols)
        b = corpus.select(F.col(block_col).alias("blk"), *b_cols)
        joined = a.join(b, "blk").filter(F.col("a") < F.col("b"))
    else:
        joined = (
            corpus.select(*a_cols)
            .crossJoin(corpus.select(*b_cols))
            .filter(F.col("a") < F.col("b"))
        )
    sim = V.cosine(F.col("va"), F.col("vb"))
    out_cols = ["a", "b", sim.alias("sim")]
    if block_col:
        out_cols = [F.col("blk").alias(block_col), *out_cols]
    return joined.select(*out_cols).filter(F.col("sim") >= threshold)


def _hyperplanes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed to a long.

    Planes are seeded constants compiled into the plan as array literals, so
    bucketing is a pure JVM expression — no UDF, no shuffle."""
    planes = _hyperplanes(n_planes, dim, seed)
    bucket = None
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(V.dot(F.col(vec_col), arr) > 0, F.lit(2**i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.withColumn(out_col, bucket.cast("long"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing the query's LSH
    bucket. Same output shape as :func:`cosine_topk`; recall < 1 by design
    (more planes -> smaller buckets -> faster + lower recall). At 100 TB the
    bucket equality becomes the shuffle key, replacing the broadcast loop."""
    cb = lsh_bucket(corpus, vec_col, n_planes, dim).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("lsh_bucket"),
    )
    qb = lsh_bucket(queries, vec_col, n_planes, dim).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("lsh_bucket"),
    )
    scored = (
        cb.join(qb, "lsh_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("q_vec"), F.col("c_vec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
