"""Fixed-point PageRank invariants (the differential check against
DuckDB's unrolled CTEs lives in test_registry_oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.pagerank import pagerank_int


def _toy_graph(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "node int")
    #  1 -> 2, 2 -> 1, 1 -> 3, 3 -> 1  (4/5 connected); 5 isolated
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (4, 1)], "src int, dst int"
    )
    return nodes, edges


def test_isolated_node_keeps_base_mass(spark):
    nodes, edges = _toy_graph(spark)
    ranks = {r.node: r.rank_micros for r in pagerank_int(nodes, edges).collect()}
    assert ranks[5] == 150_000  # (1-d)·scale, nothing flows in
    assert ranks[1] > ranks[2] > ranks[5]  # hub ranks highest


def test_mass_never_exceeds_initial_total(spark):
    """Floor division only loses mass; total rank is bounded by the
    initial n·scale (a cheap conservation sanity check)."""
    nodes, edges = _toy_graph(spark)
    total = (
        pagerank_int(nodes, edges, iterations=5)
        .agg(F.sum("rank_micros").alias("s"))
        .first()
        .s
    )
    assert 0 < total <= 5 * 1_000_000


def test_deterministic_across_partitionings(spark):
    nodes, edges = _toy_graph(spark)
    a = sorted(map(tuple, pagerank_int(nodes, edges).collect()))
    b = sorted(
        map(
            tuple,
            pagerank_int(nodes.repartition(7), edges.repartition(5)).collect(),
        )
    )
    assert a == b
