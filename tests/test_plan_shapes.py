"""Physical-plan regression tests: the scale properties the engine is
designed around must be visible in `explain` output, not just assumed.

Each test pins one 100 TB-critical plan shape:
- dimension joins broadcast (no shuffle of the fact side's join keys);
- filters and column pruning reach the parquet scan;
- ORDER BY + LIMIT plans as TakeOrderedAndProject (top-k, never a
  global sort);
- groupBy aggregates run partial (map-side) + final;
- reference-path queries contain no Python row UDFs (everything stays
  in whole-stage codegen).

A regression here usually will not fail a correctness test — it fails
at the 1000-executor scale this repo targets, so it is tested at the
plan level.
"""

from __future__ import annotations

import ecommerce_lakehouse_platform_spark.registry_ext  # noqa: F401 (registers ext queries)
from ecommerce_lakehouse_platform_spark.registry import QUERIES

from .conftest import SF_SMOKE


def _plan(spark, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_dim_joins_broadcast(spark):
    """products/customer dims join the fact side as broadcast-hash —
    a sort-merge here would shuffle the full fact table at scale."""
    plan = _plan(spark, "gold_product_metrics")
    assert "BroadcastHashJoin" in plan
    plan = _plan(spark, "gold_session_metrics_attrs")
    assert "BroadcastHashJoin" in plan


def test_filters_and_pruning_reach_the_scan(spark):
    """Null-PK filters push into the parquet scan and the scan reads
    only the projected columns (ReadSchema stays narrow)."""
    plan = _plan(spark, "op_project_silver_orders")
    assert "PushedFilters: [IsNotNull" in plan
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    # silver orders projects a handful of columns; a scan of the full
    # table schema means pruning broke
    assert "o_comment" not in read_schema


def test_topk_is_take_ordered_not_global_sort(spark):
    """ORDER BY revenue LIMIT 100 must plan as TakeOrderedAndProject:
    per-partition heaps + driver merge, no full shuffle-sort."""
    plan = _plan(spark, "dash_product_performance")
    assert "TakeOrderedAndProject" in plan


def test_aggregates_are_partial_then_final(spark):
    """Map-side combine: the plan carries two HashAggregate nodes
    (partial before the exchange, final after)."""
    plan = _plan(spark, "op_agg_pivotcount", mode="simple")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_reference_path_has_no_python_udfs(spark):
    """The entire reference-derived query surface stays JVM-side:
    no BatchEvalPython (row UDF) or ArrowEvalPython nodes anywhere."""
    for name in (
        "gold_product_metrics",
        "gold_customer_360",
        "gold_session_metrics",
        "dash_product_performance",
        "dash_sales_overview",
        "dash_site_funnel",
        "dash_customer_360",
    ):
        plan = _plan(spark, name, mode="simple")
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_session_rollup_single_shuffle(spark):
    """The session rollup shuffles exactly once on its grouping keys —
    a second exchange would double the network cost of the biggest
    stage at 100 TB."""
    plan = _plan(spark, "stream_session_window", mode="simple")
    assert plan.count("Exchange") == 1
