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


def test_triangle_stats_matches_bruteforce(spark):
    """Degree-ordered triangle census == brute-force enumeration on a
    graph with hubs, a triangle-free appendage, and an isolated edge."""
    from itertools import combinations

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        triangle_stats,
    )

    # K4 on {1..4} + path 4-5-6 + isolated edge 7-8
    edges = sorted(
        {(a, b) for a, b in combinations(range(1, 5), 2)}
        | {(4, 5), (5, 6), (7, 8)}
    )
    adj = set(edges)
    want_tri = sum(
        1
        for a, b, c in combinations(sorted({n for e in edges for n in e}), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want_wedges = sum(d * (d - 1) // 2 for d in deg.values())

    df = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    row = triangle_stats(df).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["n_edges"] == len(edges)
    assert row["n_wedges"] == want_wedges
    assert row["n_triangles"] == want_tri == 4  # the 4 faces of K4
    assert abs(row["clustering_coeff"] - 3.0 * want_tri / want_wedges) < 1e-15


def test_triangle_stats_counts_each_triangle_once(spark):
    """Uniform-degree graph (C5 has all degrees 2, every tie broken by id)
    still counts correctly — guards the (deg, id) total-order tiebreak."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        triangle_stats,
    )

    c5 = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)]  # cycle: no triangles
    row = triangle_stats(spark.createDataFrame(c5, "src long, dst long")).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 5
    k3 = [(1, 2), (2, 3), (1, 3)]
    row = triangle_stats(spark.createDataFrame(k3, "src long, dst long")).collect()[0]
    assert row["n_triangles"] == 1 and row["clustering_coeff"] == 1.0


def _reference_kcore(edges, k):
    """Python peeling reference: remove degree<k nodes until fixpoint;
    returns {node: core_degree}."""
    cur = set(edges)
    while True:
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {n for n, d in deg.items() if d < k}
        if not drop:
            return deg
        nxt = {(a, b) for a, b in cur if a not in drop and b not in drop}
        if nxt == cur:
            return deg
        cur = nxt
    # unreachable


def test_kcore_matches_python_peeling(spark):
    """K4 survives a 3-core; the path/pendant periphery peels away —
    including cascades (removing a node drops a neighbor below k)."""
    from itertools import combinations

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        k_core,
    )

    # K4 on {1..4} + pendant chain 4-5, 5-6 + isolated edge 7-8
    edges = sorted(
        {(a, b) for a, b in combinations(range(1, 5), 2)}
        | {(4, 5), (5, 6), (7, 8)}
    )
    df = spark.createDataFrame(edges, "src long, dst long").repartition(5)
    got = {r["node"]: r["core_degree"] for r in k_core(df, 3).collect()}
    assert got == _reference_kcore(edges, 3) == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=1 keeps everything; k=5 empties the graph
    assert {r["node"] for r in k_core(df, 1).collect()} == {n for e in edges for n in e}
    assert k_core(df, 5).count() == 0


def test_kcore_matches_reference_on_arbitrary_graphs(spark):
    """Hypothesis: distributed peeling == the Python reference on random
    graphs (cascading removals exercised by construction), and every
    survivor keeps >= k surviving neighbors (the k-core invariant)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        k_core,
    )

    pair = st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(
        lambda p: p[0] < p[1]
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=st.sets(pair, min_size=1, max_size=14), k=st.sampled_from([2, 3]))
    def run(edges, k):
        edges = sorted(edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["core_degree"] for r in k_core(df, k).collect()}
        assert got == _reference_kcore(edges, k)
        for n, d in got.items():
            assert d >= k

    run()


def test_k_core_raises_on_truncated_peel(spark):
    """Exhausting max_iters before the fixpoint must raise -- a truncated
    peel is NOT a k-core and must not masquerade as one."""
    import pytest

    # a 4-node path graph peels away one layer per round under k=2
    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        k_core,
    )

    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(df, 2, max_iters=1).collect()


def test_k_core_final_round_fixpoint_is_accepted(spark):
    """max_iters exactly equal to the peel rounds needed must NOT raise:
    convergence is normally observed via an extra confirming round, but
    when the survivor set is already degree-stable the result IS the
    k-core (round-7 ADVICE — a correct result was being discarded)."""
    from itertools import combinations

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        k_core,
    )

    # K4 + one pendant: a single peel round reaches the fixpoint
    edges = sorted({(a, b) for a, b in combinations(range(1, 5), 2)} | {(4, 5)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["core_degree"] for r in k_core(df, 3, max_iters=1).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pagerank_int_matches_python_reference_and_layout(spark):
    """pagerank_int == a pure-Python integer recursion with the same
    truncating-div semantics, on any input partitioning — the property
    that makes the DuckDB unrolled-CTE oracle trustworthy."""
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        pagerank_int,
    )

    edges = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 2)]
    sym = edges + [(b, a) for a, b in edges]
    sym = sorted(set(sym))
    SCALE, T = 10**12, 4
    nodes = sorted({n for e in sym for n in e})
    out_nb = {n: [b for a, b in sym if a == n] for n in nodes}
    n = len(nodes)
    base = (15 * (SCALE // n)) // 100
    r = {v: SCALE // n for v in nodes}
    for _ in range(T):
        s = {v: 0 for v in nodes}
        for u in nodes:
            c = r[u] // len(out_nb[u])
            for v in out_nb[u]:
                s[v] += c
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    for parts in (1, 3):
        df = spark.createDataFrame(sym, ["src", "dst"]).repartition(parts)
        got = {
            row["node"]: row["rank_i"]
            for row in pagerank_int(df, n_iters=T).collect()
        }
        assert got == r


def test_pagerank_int_rejects_dangling_nodes(spark):
    import pytest

    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.graph import (
        pagerank_int,
    )

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])  # 2 has no out-edge
    with pytest.raises(ValueError, match="dangling"):
        pagerank_int(df)
