"""Connected components + cluster dedup (operators/cluster.py).

Ground truth for the property test is a driver-side union-find — the
same closure a DuckDB recursive CTE computes in the oracle gate.
"""

from __future__ import annotations


from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from deltalake2db_spark.operators.cluster import (
    connected_components,
    dedup_by_clusters,
)


def _cc_bruteforce(edges):
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
    # min-label canonicalization
    return {v: find(v) for v in parent}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def test_path_graph_collapses_to_min(spark):
    # 0-1-2-3 is a path: 3 only reaches 0 through two hops
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            _pairs_df(spark, [(0, 1), (1, 2), (2, 3)])
        ).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0)}


def test_two_components_and_reversed_edges(spark):
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            _pairs_df(spark, [(5, 4), (9, 8), (8, 7)])
        ).collect()
    }
    assert got == {(4, 4), (5, 4), (7, 7), (8, 7), (9, 7)}


def test_dedup_keeps_representative_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    survivors = {
        r["doc_id"]
        for r in dedup_by_clusters(
            docs, _pairs_df(spark, [(0, 1), (1, 2), (4, 5)])
        ).collect()
    }
    # cluster {0,1,2} -> keep 0; cluster {4,5} -> keep 4; 3 unpaired
    assert survivors == {0, 3, 4}


@settings(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    assume(edges)
    want = _cc_bruteforce(edges)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == want


def test_local_and_distributed_paths_agree(spark):
    """The adaptive driver-side union-find (small graphs) and the
    iterative min-label loop must produce identical labelings."""
    edges = [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5), (9, 10), (2, 3)]
    df = _pairs_df(spark, edges)
    local = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()  # takes local path
    }
    dist = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, local_threshold=0).collect()
    }
    assert local == dist
    assert local[3] == 0 and local[5] == 5 and local[10] == 9
