"""Silver layer: typed, cleansed, deduplicated projections of the raw
fixture tables, phrased exactly like the reference's silver models
(/root/reference/02_silver/02_silver_transform.py) over the driver's
TPC-H-ish fixtures (mapping: FIXTURES.md §C).

Every model is a pure DataFrame→DataFrame function: scan → typed
select-projection (cast/rename) → null-PK filter → (where a recency
column exists) keep-latest dedupe. All column expressions are built-in
functions — zero UDFs — so plans stay in whole-stage codegen and
filters/projections push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import clean_id


def silver_customers(customer: DataFrame) -> DataFrame:
    """customers: normalize PK, trim/lower strings, typed casts.

    Reference model: 02_silver_transform.py:53-69 (customers_clean).
    """
    return (
        customer.select(
            clean_id("c_custkey").alias("customer_id"),
            F.trim(F.col("c_name")).alias("name"),
            F.lower(F.trim(F.col("c_mktsegment"))).alias("segment"),
            F.col("c_nationkey").cast("int").alias("nation_key"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .filter(F.col("customer_id").isNotNull())
    )


def silver_events(events: DataFrame) -> DataFrame:
    """clickstream events: typed projection + event_date derivation.

    Event-type mapping per FIXTURES.md §C: view≅page_view,
    click≅add_to_cart, purchase≅purchase (other types pass through).
    Reference model: 02_silver_transform.py:82-104 (events_clean).

    The fixture's ``ts`` arrives as nanos-since-epoch (long, see
    session.tune_session); integer ``div`` keeps the nanos→micros
    truncation exact (double division would round the tail).
    """
    event_ts = (
        F.timestamp_micros(F.expr("ts div 1000"))
        if dict(events.dtypes).get("ts") == "bigint"
        else F.col("ts").cast("timestamp")
    )
    return (
        events.select(
            clean_id("event_id").alias("event_id"),
            clean_id("user_id").alias("user_id"),
            event_ts.alias("event_ts"),
            F.col("event_type").cast("string").alias("event_type"),
            F.col("value").cast("double").alias("amount_usd"),
            F.col("props").cast("string").alias("props"),
        )
        .withColumn("event_date", F.to_date("event_ts"))
        .filter(F.col("event_id").isNotNull())
    )


def silver_orders(orders: DataFrame) -> DataFrame:
    """orders: normalize keys, derive order_date.

    Reference model: 02_silver_transform.py:115-137 (orders_clean).
    """
    return (
        orders.select(
            clean_id("o_orderkey").alias("order_id"),
            clean_id("o_custkey").alias("customer_id"),
            F.col("o_orderdate").cast("timestamp").alias("order_ts"),
            F.col("o_orderstatus").cast("string").alias("status"),
            F.col("o_orderpriority").cast("string").alias("priority"),
            F.col("o_totalprice").cast("double").alias("total_usd"),
        )
        .withColumn("order_date", F.to_date("order_ts"))
        .filter(F.col("order_id").isNotNull())
    )


def silver_order_items(
    lineitem: DataFrame, orders_clean: DataFrame | None
) -> DataFrame:
    """order line items: positive-quantity filter + order_date backfill
    via left join to orders (coalesce to a sentinel when the parent
    order is missing).

    Reference model: 02_silver_transform.py:148-174 (order_items_clean,
    incl. the left-join enrichment at :162-166).

    ``orders_clean=None`` skips the enrichment join (the frame then
    has no ``order_date``): consumers that never read ``order_date``
    (the per-product sales rollup) pay a whole orders scan + broadcast
    + probe for a column they drop — Catalyst cannot eliminate the
    join itself because it cannot prove ``order_id`` unique on the
    orders side. ``order_id`` IS the orders PK, so the left join is
    multiplicity-preserving and the pruned frame feeds those consumers
    identically (their DuckDB oracles never joined orders either).
    """
    items = lineitem.select(
        clean_id("l_orderkey").alias("order_id"),
        clean_id("l_partkey").alias("product_id"),
        F.col("l_linenumber").cast("int").alias("line_number"),
        F.col("l_quantity").cast("int").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("line_total_usd"),
        F.col("l_discount").cast("double").alias("discount_pct"),
    ).filter(F.col("order_id").isNotNull() & (F.col("quantity") > 0))
    if orders_clean is None:
        return items
    enriched = items.join(
        orders_clean.select("order_id", "order_date"), ["order_id"], "left"
    )
    return enriched.withColumn(
        "order_date", F.coalesce(F.col("order_date"), F.lit("1970-01-01").cast("date"))
    )


def silver_products(part: DataFrame) -> DataFrame:
    """products dim: typed projection (small, broadcast-friendly).

    Reference model: 02_silver_transform.py:185-202 (products_clean).
    """
    return (
        part.select(
            clean_id("p_partkey").alias("product_id"),
            F.trim(F.col("p_name")).alias("product_name"),
            F.col("p_type").cast("string").alias("category"),
            F.col("p_brand").cast("string").alias("brand"),
            F.col("p_retailprice").cast("double").alias("price_usd"),
        )
        .filter(F.col("product_id").isNotNull())
    )
