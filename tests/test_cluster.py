"""Connected-components / dedup-cluster operator tests
(operators/cluster.py): transitive closure on multi-hop chains,
singleton handling, and convergence within the pointer-jumping bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
)


def _cc_dict(df):
    return {r["node"]: r["component"] for r in df.collect()}


# both execution paths must give the identical relation: 0 forces the
# distributed pointer-jumping loop, the default takes the bounded
# driver union-find fast path on graphs this small
_PATHS = [0, 1 << 20]


def test_chain_collapses_to_min(spark):
    # 10-node path 0-1-2-...-9: diameter 9, one component
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    for limit in _PATHS:
        got = _cc_dict(connected_components(edges, small_graph_limit=limit))
        assert got == {i: 0 for i in range(10)}, limit


def test_multiple_components_and_unordered_edges(spark):
    edges = spark.createDataFrame(
        [(7, 3), (3, 9), (20, 11), (5, 5)], "src long, dst long"
    )
    for limit in _PATHS:
        got = _cc_dict(connected_components(edges, small_graph_limit=limit))
        assert got == {3: 3, 7: 3, 9: 3, 11: 11, 20: 11, 5: 5}, limit


def test_pointer_jumping_converges_fast(spark):
    # a 40-node path converges well inside 8 rounds with pointer
    # jumping (plain propagation would need 39)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], "src long, dst long"
    )
    got = _cc_dict(
        connected_components(edges, max_iter=8, small_graph_limit=0)
    )
    assert set(got.values()) == {0}


def _union_find_components(edges):
    """Reference implementation: classic union-find."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    # canonical = min of component
    comp = {}
    for x in list(parent):
        root = find(x)
        comp.setdefault(root, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_random_graphs_match_union_find(spark):
    """Property check vs a union-find reference on deterministic
    pseudo-random graphs of varying density (a regression here means
    the distributed label propagation breaks transitivity)."""
    import random

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 60), (3, 25, 5)]:
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        want = _union_find_components(edges)
        for limit in _PATHS:
            got = _cc_dict(
                connected_components(
                    spark.createDataFrame(edges, "src long, dst long"),
                    small_graph_limit=limit,
                )
            )
            assert got == want, (seed, limit, got, want)


def test_dedup_clusters_singletons_and_canonical(spark):
    items = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 4), (4, 2)], "doc_a long, doc_b long"
    )
    out = dedup_clusters(items, pairs, id_col="doc_id")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}
    assert rows == {
        0: (0, True),
        1: (1, True),
        2: (1, False),
        3: (3, True),
        4: (1, False),
        5: (5, True),
    }
    keepers = out.filter(F.col("is_canonical")).count()
    assert keepers == 4  # {0} {1,2,4} {3} {5}
