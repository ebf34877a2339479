"""End-to-end medallion pipeline: bronze → silver → gold → DQ gate.

The reference's macro-lifecycle (README.md:26-33 there): idempotent
full-overwrite materialization between layers, fail-fast DQ gate
before any BI query runs, re-runnable in order. Gold/silver fact
tables are written PARTITIONED BY their date column so the dashboard
BETWEEN predicates become partition-pruned scans — the load-bearing
layout decision at 100 TB (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dq import CheckResult, expect
from ..sources.catalog import load_table
from ..sources.writers import read_table, table_counts, write_table
from . import gold, silver


@dataclass
class PipelineResult:
    silver_counts: dict[str, int] = field(default_factory=dict)
    gold_counts: dict[str, int] = field(default_factory=dict)
    dq_results: list[CheckResult] = field(default_factory=list)


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse: str,
    raise_on_dq_failure: bool = True,
    table_format: str | None = None,
) -> PipelineResult:
    """Materialize every layer under ``warehouse`` and gate on DQ.

    Bronze is the fixture parquet itself (already columnar); silver
    and gold are written out, facts partitioned by date.

    ``table_format="minidelta"`` materializes every layer as a
    Delta-protocol-logged table (sources/deltalog/) instead of raw
    parquet — versioned overwrites, time travel, and CDF on the
    pipeline outputs, which is the reference's managed-Delta
    deployment shape (02_silver_transform.py:29-37).
    """
    result = PipelineResult()

    def write(df, path, partition_by=None):
        write_table(df, path, partition_by=partition_by, fmt=table_format)

    def read(path):
        return read_table(spark, path, fmt=table_format)

    # --- silver ---------------------------------------------------
    customers = silver.silver_customers(load_table(spark, sf_dir, "customer"))
    orders = silver.silver_orders(load_table(spark, sf_dir, "orders"))
    items = silver.silver_order_items(load_table(spark, sf_dir, "lineitem"), orders)
    events = silver.silver_events(load_table(spark, sf_dir, "events"))
    products = silver.silver_products(load_table(spark, sf_dir, "part"))

    write(customers, f"{warehouse}/silver/customers")
    write(orders, f"{warehouse}/silver/orders", partition_by="order_date")
    write(items, f"{warehouse}/silver/order_items", partition_by="order_date")
    write(events, f"{warehouse}/silver/events", partition_by="event_date")
    write(products, f"{warehouse}/silver/products")

    silver_tables = {
        name: read(f"{warehouse}/silver/{name}")
        for name in ["customers", "orders", "order_items", "events", "products"]
    }
    result.silver_counts = table_counts(silver_tables)

    # --- gold (reads the materialized silver, like the reference) --
    g_daily = gold.gold_daily_metrics(silver_tables["events"], silver_tables["orders"])
    g_products = gold.gold_product_metrics(
        silver_tables["order_items"], silver_tables["products"]
    )
    g_funnel = gold.gold_product_funnel(silver_tables["events"])
    g_sessions = gold.gold_session_metrics(
        silver_tables["events"], silver_tables["customers"]
    )
    g_c360 = gold.gold_customer_360(
        silver_tables["customers"], silver_tables["orders"]
    )

    write(g_daily, f"{warehouse}/gold/daily_metrics", partition_by="event_date")
    write(g_products, f"{warehouse}/gold/product_metrics")
    write(g_funnel, f"{warehouse}/gold/product_funnel", partition_by="event_date")
    write(g_sessions, f"{warehouse}/gold/session_metrics")
    write(g_c360, f"{warehouse}/gold/customer_360")

    gold_tables = {
        name: read(f"{warehouse}/gold/{name}")
        for name in [
            "daily_metrics",
            "product_metrics",
            "product_funnel",
            "session_metrics",
            "customer_360",
        ]
    }
    result.gold_counts = table_counts(gold_tables)

    # --- DQ gate (the reference's four invariants over OUR gold) ---
    pm, c360 = gold_tables["product_metrics"], gold_tables["customer_360"]
    sm, pf = gold_tables["session_metrics"], gold_tables["product_funnel"]
    checks = [
        (pm, "gold_product_integrity",
         F.col("product_name").isNull() | F.col("category").isNull()),
        (
            c360.groupBy("customer_id").count().withColumnRenamed("count", "n"),
            "customer_360_pk_unique",
            F.col("n") > 1,
        ),
        (sm, "non_negative_session_values",
         (F.col("session_duration_sec") < 0) | (F.col("session_revenue") < 0)),
        (pf, "funnel_rates_bounded",
         (F.col("view_to_cart_pct") > 100) | (F.col("cart_to_purchase_pct") > 100)),
    ]
    for df, name, pred in checks:
        result.dq_results.append(
            expect(df, name, pred, raise_on_failure=raise_on_dq_failure)
        )
    return result
