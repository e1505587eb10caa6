"""Iterative graph algorithms as DataFrame joins.

PageRank is the second iterative operator in the engine (after
``components.connected_components``): each iteration is ONE hash-join of
the narrow ``(src, dst)`` edge list with the ``(node, rank)`` vector plus
one map-side-combined aggregation by ``dst`` — the classic Pregel-free
formulation. Nothing driver-sized ever holds the graph: the only
driver-side values are the node count and the per-iteration dangling-rank
scalar (two 1-row aggregates).

Scale shape at 100 TB of edges: ranks are (long, double) pairs — the join
shuffles the edge list once per iteration on ``src`` and the contribution
aggregate shuffles (dst, double) partials. Pre-partitioning both sides on
the node id (bucketed edge tables) makes the per-iteration join
exchange-free; AQE handles hub-node skew the same way it handles any hot
aggregation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Standard damped PageRank with uniform dangling-mass redistribution:

    ``r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + dangling/N)``

    Fixed ``n_iters`` power iterations (deterministic output shape — no
    convergence-test collect per iteration beyond the dangling scalar).
    Returns ``(node, rank)``; ranks sum to 1 up to float error."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).cache()
    for _ in range(n_iters):
        with_deg = ranks.join(deg, ranks["node"] == deg["src"], "left")
        # dangling nodes (no out-edges) spread their rank uniformly
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("s")
        ).collect()[0]["s"]
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_rank"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_rank"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .cache()
        )
        new_ranks.count()  # materialize before dropping the parent
        ranks.unpersist()
        ranks = new_ranks
    return ranks
