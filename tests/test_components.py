"""Connected components / dedup clustering vs a reference union-find."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_simple_chain(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.components import (
        connected_components,
    )

    # chain 1-2-3-4 plus isolated pair 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda t: t[0] != t[1]),
        min_size=1,
        max_size=20,
    )
)
def test_components_match_union_find(spark, edges):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    expected = _union_find(16, edges)
    assert got == expected


def test_dedup_clusters_assigns_singletons(spark):
    from azure_cloud_based_end_to_end_data_pipeline_development_for_etl_and_visualization_spark.operators.components import (
        dedup_clusters,
    )

    pairs = spark.createDataFrame([(2, 5), (5, 7)], "a long, b long")
    ids = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    got = {r["doc_id"]: r["cluster_rep"] for r in dedup_clusters(pairs, ids).collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 2, 6: 6, 7: 2, 8: 8}
    kept = [d for d, rep in got.items() if d == rep]
    assert sorted(kept) == [1, 2, 3, 4, 6, 8]  # one per cluster
