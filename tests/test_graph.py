"""PageRank operator: reference-recursion parity + layout independence."""

from __future__ import annotations

from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
    pagerank,
)


def _reference_pagerank(edges, n_iters=10, d=0.85):
    """Scalar reference implementation of the identical recursion."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(n_iters):
        dangling = sum(r for v, r in ranks.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += ranks[u] / out[u]
        ranks = {
            v: (1.0 - d) / n + d * (contrib[v] + dangling / n) for v in nodes
        }
    return ranks


#: classic 4-node graph with a dangling node (D has no out-edges)
EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (2, 4)]


def test_pagerank_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iters=10).collect()}
    want = _reference_pagerank(EDGES, n_iters=10)
    assert set(got) == set(want)
    for v, r in want.items():
        assert abs(got[v] - r) < 1e-9, (v, got[v], r)
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_layout_independent(spark):
    df1 = spark.createDataFrame(EDGES, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(EDGES, "src long, dst long").repartition(8)
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, n_iters=6).collect()}
    r8 = {r["node"]: r["rank"] for r in pagerank(df8, n_iters=6).collect()}
    for v in r1:
        assert abs(r1[v] - r8[v]) < 1e-12
