"""Two-pass heavy hitters: candidate-pass superset guarantees (both
the JVM partition-threshold default and the bounded-memory Misra-Gries
alternative) + exact equivalence to GROUP BY + HAVING."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.frequency import (
    heavy_hitters,
    misra_gries_candidates,
    partition_threshold_candidates,
)


def _exact_heavy_hitters(df, item_col, phi):
    items = df.select(F.col(item_col).cast("string").alias("item"))
    n = items.count()
    thresh = math.ceil(phi * n)
    return (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_count"))
        .filter(F.col("item_count") >= thresh)
    )


@pytest.mark.parametrize("phi", [0.0005, 0.002, 0.005])
def test_heavy_hitters_equals_group_by(spark, sf_dir, phi):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {tuple(r) for r in heavy_hitters(li, "l_partkey", phi).collect()}
    want = {tuple(r) for r in _exact_heavy_hitters(li, "l_partkey", phi).collect()}
    assert got == want
    assert got, "fixture should produce at least one heavy hitter"


def test_candidates_are_superset_of_heavy_hitters(spark, sf_dir):
    """The MG guarantee: every true heavy hitter survives the
    per-partition summaries, at any partitioning."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(7)
    phi = 0.002
    k = math.ceil(1.0 / phi)
    items = li.select(F.col("l_partkey").cast("string").alias("item"))
    cand = {r.item for r in misra_gries_candidates(items, "item", k).collect()}
    truth = {r.item for r in _exact_heavy_hitters(li, "l_partkey", phi).collect()}
    assert truth <= cand


def test_jvm_candidates_are_superset_of_heavy_hitters(spark, sf_dir):
    """The partition-threshold (JVM default) guarantee: a global heavy
    hitter is a local heavy hitter somewhere, at any partitioning."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(7)
    phi = 0.002
    items = li.select(F.col("l_partkey").cast("string").alias("item"))
    cand = {
        r.item for r in partition_threshold_candidates(items, "item", phi).collect()
    }
    truth = {r.item for r in _exact_heavy_hitters(li, "l_partkey", phi).collect()}
    assert truth <= cand


def test_bounded_memory_path_equals_jvm_path(spark, sf_dir):
    """Both candidate passes feed the same exact verify, so the two
    heavy_hitters modes must return identical results."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    phi = 0.002
    jvm = {tuple(r) for r in heavy_hitters(li, "l_partkey", phi).collect()}
    mg = {
        tuple(r)
        for r in heavy_hitters(li, "l_partkey", phi, bounded_memory=True).collect()
    }
    assert jvm == mg


def test_candidate_count_bounded_by_k_per_partition(spark):
    """Each partition contributes at most k counters — the bounded-
    memory contract that lets the pass scale past groupBy spill."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 1000).cast("string").alias("item")
    ).repartition(4)
    k = 10
    cand = misra_gries_candidates(df, "item", k)
    assert cand.count() <= 4 * k


@settings(
    max_examples=5,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=st.lists(
        st.sampled_from([f"k{i}" for i in range(12)]), min_size=1, max_size=400
    ),
    phi=st.sampled_from([0.01, 0.05, 0.2]),
    parts=st.integers(min_value=1, max_value=6),
)
def test_heavy_hitters_property(spark, items, phi, parts):
    """MG-candidates + exact verify == GROUP BY + HAVING for arbitrary
    skew, phi, and partitioning (the guarantee is data- and
    layout-independent)."""
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(
        parts
    )
    got = {tuple(r) for r in heavy_hitters(df, "item", phi).collect()}
    want = {tuple(r) for r in _exact_heavy_hitters(df, "item", phi).collect()}
    assert got == want
