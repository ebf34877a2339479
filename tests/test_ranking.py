"""Tests for operators/ranking.py — distributed global ranking.

Correctness: two-pass rank must be bit-identical to the native
single-task ``Window.orderBy`` row_number for any total order, and
``ntile_from_rank`` must reproduce ``F.ntile`` exactly (including the
uneven-bucket remainder rule and the n < k edge).

Scale shape: the only single-partition exchange in the plan must be
the W-row partition-count side, never the data itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.ranking import (
    global_row_number,
    ntile_from_rank,
)


def _mk(spark, n, seed=7):
    return (
        spark.range(n)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64("id") + seed, F.lit(1000)).alias("key"),
        )
        .repartition(8)
    )


@pytest.mark.parametrize("n", [0, 1, 5, 1000])
def test_global_row_number_matches_native_window(spark, n):
    df = _mk(spark, n)
    order = [F.col("key"), F.col("id")]
    got = global_row_number(df, order, rank_col="r")
    want = df.withColumn(
        "r", F.row_number().over(Window.orderBy("key", "id")).cast("long")
    )
    assert sorted(got.select("id", "r").collect()) == sorted(
        want.select("id", "r").collect()
    )


def test_global_row_number_descending_order(spark):
    df = _mk(spark, 500)
    order = [F.col("key").desc(), F.col("id").desc()]
    got = global_row_number(df, order, rank_col="r")
    want = df.withColumn(
        "r",
        F.row_number()
        .over(Window.orderBy(F.col("key").desc(), F.col("id").desc()))
        .cast("long"),
    )
    assert sorted(got.select("id", "r").collect()) == sorted(
        want.select("id", "r").collect()
    )


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (1000, 4), (1001, 7)])
def test_ntile_from_rank_matches_native_ntile(spark, n, k):
    df = _mk(spark, n)
    ranked = global_row_number(df, [F.col("key"), F.col("id")], rank_col="r")
    cnt = df.agg(F.count(F.lit(1)).alias("n"))
    got = (
        ranked.crossJoin(F.broadcast(cnt))
        .select("id", ntile_from_rank(F.col("r"), F.col("n"), k).alias("t"))
    )
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy("key", "id")).alias("t")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_no_full_data_single_partition_exchange(spark):
    """The data path must range-partition, not funnel through one
    task; the only SinglePartition exchange allowed is the W-row
    offsets side (it feeds a BroadcastExchange, not the main sort)."""
    df = _mk(spark, 1000)
    got = global_row_number(df, [F.col("key"), F.col("id")], rank_col="r")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # native global window would show Window over SinglePartition on
    # the full data; here every Window is partitioned by _pid
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line, line


def test_global_rank_with_ties_matches_native(spark):
    from ecommerce_lakehouse_platform_spark.operators.ranking import (
        global_rank_with_ties,
        percent_rank_from_rank,
    )

    # key has heavy ties (1000 rows, 50 distinct values)
    df = (
        spark.range(1000)
        .select(
            F.col("id"), F.pmod(F.xxhash64("id"), F.lit(50)).alias("key")
        )
        .repartition(8)
    )
    got = global_rank_with_ties(
        df,
        [F.col("key").desc(), F.col("id")],
        ["key"],
        rank_col="r",
        dense_col="d",
    )
    n = df.count()
    got = got.select(
        "id", "r", "d",
        percent_rank_from_rank(F.col("r"), F.lit(n)).alias("p"),
    )
    w = Window.orderBy(F.col("key").desc())
    want = df.select(
        "id",
        F.rank().over(w).cast("long").alias("r"),
        F.dense_rank().over(w).cast("long").alias("d"),
        F.percent_rank().over(w).alias("p"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_percent_rank_single_row(spark):
    from ecommerce_lakehouse_platform_spark.operators.ranking import (
        percent_rank_from_rank,
    )

    row = spark.range(1).select(
        percent_rank_from_rank(F.lit(1), F.lit(1)).alias("p")
    ).first()
    assert row["p"] == 0.0


def test_global_row_number_single_range_exchange(spark):
    """The range-partitioned (_pid-stamped) frame must be materialized
    (persisted) before it fans out to the count branch and the rank
    branch. Two independently-planned range exchanges would each
    SAMPLE their own boundaries and could assign rows different _pids
    — per-partition counts joined against ranks from a different
    partitioning silently corrupt the global rank. The pin: both
    consumers read one InMemoryRelation, so the final plan shows
    InMemoryTableScans and NO bare rangepartitioning exchange outside
    the cached subplan's inline print."""
    df = _mk(spark, 500)
    got = global_row_number(df, [F.col("key"), F.col("id")], rank_col="r")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = got._jdf.queryExecution().explainString(jmode)
    assert plan.count("InMemoryTableScan") >= 2, plan
    # the range exchange lives inside the cached relation (printed
    # inline at the scans); the outer plan must not re-plan it
    head = plan.split("InMemoryRelation")[0]
    assert "rangepartitioning" not in head.lower(), head
    spark.catalog.clearCache()
