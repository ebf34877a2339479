"""Bucketed co-located join (sources/writers.write_bucketed): joining
two tables bucketed on the same key with the same bucket count must
plan ZERO shuffle exchanges — the write-once/join-many layout for
fact-fact joins at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.sources.catalog import load_table
from ecommerce_lakehouse_platform_spark.sources.writers import write_bucketed

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_cols="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        sort_cols="o_orderkey",
    )
    yield "b_orders", "b_lineitem"
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # at fixture scale Spark rightly prefers a broadcast join (and
    # disables bucketing); force the large-large path the layout is
    # FOR by turning auto-broadcast off, as a 100-TB fact-fact join
    # planner would.
    t_orders, t_items = bucketed_tables
    thresholds = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in thresholds}
    try:
        for k, v in thresholds.items():
            spark.conf.set(k, v)
        joined = spark.table(t_items).join(spark.table(t_orders), "o_orderkey")
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == spark.table(t_items).count()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    _, t_items = bucketed_tables
    agg = (
        spark.table(t_items)
        .groupBy("o_orderkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("rev"))
    )
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    t_orders, t_items = bucketed_tables
    bucketed = (
        spark.table(t_items)
        .join(spark.table(t_orders), "o_orderkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("s"))
        .collect()[0]["s"]
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    items = load_table(spark, SF_SMOKE, "lineitem")
    plain = (
        items.join(orders, items["l_orderkey"] == orders["o_orderkey"])
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).alias("s"))
        .collect()[0]["s"]
    )
    assert bucketed == plain
