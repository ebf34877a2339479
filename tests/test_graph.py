"""Degree-oriented triangle counting (operators/graph.py): known
closed-form graphs, skew/star shapes where naive wedge counting
blows up, brute-force cross-check on a pseudo-random graph, and
input-canonicalization invariance (direction, duplicates, loops).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.graph import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    return {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}


def test_k4_every_vertex_on_three_triangles(spark):
    # K4 has C(4,3)=4 triangles; each vertex sits on C(3,2)=3 of them
    edges = list(combinations(range(4), 2))
    assert _counts(spark, edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_star_and_path_have_no_triangles(spark):
    star = [(0, i) for i in range(1, 20)]  # hub degree 19, 0 triangles
    path = [(100 + i, 101 + i) for i in range(10)]
    assert _counts(spark, star + path) == {}


def test_triangle_with_pendant(spark):
    # one triangle (1,2,3) plus a pendant edge 3-4
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    assert _counts(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_direction_duplicates_and_loops_are_canonicalized(spark):
    # same triangle given twice, in mixed direction, plus a self-loop
    edges = [(1, 2), (2, 1), (3, 2), (1, 3), (3, 1), (2, 2)]
    assert _counts(spark, edges) == {1: 1, 2: 1, 3: 1}


def test_matches_bruteforce_on_random_graph(spark):
    # deterministic pseudo-random graph on 30 nodes
    edges = []
    x = 1
    for _ in range(200):
        x = (x * 1103515245 + 12345) % (2**31)
        u, v = x % 30, (x // 30) % 30
        if u != v:
            edges.append((u, v))
    adj = set()
    for u, v in edges:
        adj.add((min(u, v), max(u, v)))
    expected: dict[int, int] = {}
    for a, b, c in combinations(sorted({n for e in adj for n in e}), 3):
        if (a, b) in adj and (b, c) in adj and (a, c) in adj:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    assert _counts(spark, edges) == expected


def test_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u long, v long")
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
