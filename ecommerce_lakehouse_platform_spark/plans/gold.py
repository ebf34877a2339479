"""Gold layer: the reference's four aggregate models, re-expressed
over the fixture mapping (FIXTURES.md §C).

All models are groupBy/agg + equi-join compositions — Catalyst plans
partial+final hash aggregation, broadcasts the small dims, and AQE
handles skew; there is nothing imperative here.

Determinism deviations from the reference (documented, SURVEY.md §5):
- money sums go through DECIMAL (order-independent) and are returned
  as double;
- ``F.first(event_date)`` is replaced by ``F.min`` (the reference's
  F.first at 03_gold/03_gold_aggregate.py:170 is non-deterministic);
- wall-clock (``current_date``) is replaced by an ``as_of`` parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.math import dec_sum, round2, safe_div_null, safe_pct_capped
from ..operators.sessionize import assign_sessions

# Fixture event-type mapping (FIXTURES.md §C): page_view≅view,
# add_to_cart≅click, purchase≅purchase.
VIEW, CART, PURCHASE = "view", "click", "purchase"


def gold_daily_metrics(events_clean: DataFrame, orders_clean: DataFrame) -> DataFrame:
    """Daily event metrics ⟗ daily sales metrics with zero-fill.

    The reference's product_metrics full-outer shape
    (/root/reference/03_gold/03_gold_aggregate.py:48-88): conditional
    counts on one side, money sums on the other, full_outer on the
    date key, then coalesce-to-zero on every metric (null-fill is
    load-bearing for dates present on only one side).
    """
    event_metrics = events_clean.groupBy("event_date").agg(
        F.sum(F.when(F.col("event_type") == VIEW, 1).otherwise(0)).alias("view_count"),
        F.sum(F.when(F.col("event_type") == CART, 1).otherwise(0)).alias("cart_count"),
        F.sum(F.when(F.col("event_type") == PURCHASE, 1).otherwise(0)).alias(
            "purchase_count"
        ),
    )
    order_metrics = (
        orders_clean.withColumnRenamed("order_date", "event_date")
        .groupBy("event_date")
        .agg(
            dec_sum(F.col("total_usd")).alias("gross_revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )
    joined = event_metrics.join(order_metrics, ["event_date"], "full_outer")
    return joined.select(
        "event_date",
        F.coalesce("view_count", F.lit(0)).alias("view_count"),
        F.coalesce("cart_count", F.lit(0)).alias("cart_count"),
        F.coalesce("purchase_count", F.lit(0)).alias("purchase_count"),
        F.coalesce("gross_revenue", F.lit(0.0)).alias("gross_revenue"),
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
    )


def gold_product_metrics(
    items_clean: DataFrame, products_clean: DataFrame
) -> DataFrame:
    """Per-product sales rollup + dim enrich + rating-style aggs.

    Mirrors product_metrics' semantics (03_gold_aggregate.py:57-92):
    sales agg ⟕ products dim ⟕ review-style aggs, with zero/UNKNOWN
    coalesces. The reference computes sales and review aggs as two
    separate scans joined on product_id; here both group the same
    input on the same key with no differing filters, so that join is
    1:1 on identical key sets and the two fuse into ONE groupBy —
    identical output, half the fact scans, and one shuffle instead of
    two plus a join (the scale-relevant difference at 100 TB). The
    review stand-in (FIXTURES.md §C): per-product avg/count of the
    line discount plays AVG(rating)/COUNT(review_id)
    (03_gold_aggregate.py:70-75). The dim side is small → broadcast.
    """
    sales = items_clean.groupBy("product_id").agg(
        dec_sum(F.col("line_total_usd")).alias("total_revenue"),
        F.sum("quantity").cast("long").alias("units_sold"),
        F.count(F.lit(1)).alias("line_count"),
        round2(
            F.sum(F.col("discount_pct").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_rating"),
        F.count(F.lit(1)).alias("review_count"),
    )
    dim = products_clean.select("product_id", "product_name", "category", "price_usd")
    return (
        sales.join(F.broadcast(dim), ["product_id"], "left")
        .select(
            "product_id",
            F.coalesce("product_name", F.lit("UNKNOWN")).alias("product_name"),
            F.coalesce("category", F.lit("UNKNOWN")).alias("category"),
            "total_revenue",
            "units_sold",
            "line_count",
            F.coalesce("avg_rating", F.lit(0.0)).alias("avg_rating"),
            F.coalesce("review_count", F.lit(0)).alias("review_count"),
        )
    )


def gold_product_funnel(events_clean: DataFrame) -> DataFrame:
    """Daily funnel with capped safe percentages.

    Reference: product_funnel (03_gold_aggregate.py:127-155) — the
    ``least(100, round(...))`` capping and den==0→0.0 convention are
    preserved exactly.
    """
    daily = events_clean.groupBy("event_date").agg(
        F.sum(F.when(F.col("event_type") == VIEW, 1).otherwise(0)).alias("view_count"),
        F.sum(F.when(F.col("event_type") == CART, 1).otherwise(0)).alias("cart_count"),
        F.sum(F.when(F.col("event_type") == PURCHASE, 1).otherwise(0)).alias(
            "purchase_count"
        ),
    )
    return daily.select(
        "event_date",
        "view_count",
        "cart_count",
        "purchase_count",
        safe_pct_capped(F.col("cart_count"), F.col("view_count")).alias(
            "view_to_cart_pct"
        ),
        safe_pct_capped(F.col("purchase_count"), F.col("cart_count")).alias(
            "cart_to_purchase_pct"
        ),
    )


def gold_session_metrics(
    events_clean: DataFrame,
    customers_clean: DataFrame | None = None,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: bounds, counts, purchase revenue, duration,
    plus left-joined user attributes with UNKNOWN defaults.

    Reference: session_metrics (03_gold_aggregate.py:166-211). The
    reference's ``F.first(event_date)`` becomes ``min(event_date)``
    (deterministic; differs only for midnight-spanning sessions).
    Duration is epoch-second subtraction exactly as at :195-197.
    """
    sessions = assign_sessions(events_clean, "user_id", "event_ts", gap_seconds)
    agg = sessions.groupBy("user_id", "session_id").agg(
        F.min("event_ts").alias("session_start_ts"),
        F.max("event_ts").alias("session_end_ts"),
        F.min("event_date").alias("session_date"),
        F.count("event_id").alias("event_count"),
        dec_sum(
            F.when(F.col("event_type") == PURCHASE, F.col("amount_usd")).otherwise(
                F.lit(0.0)
            )
        ).alias("session_revenue"),
        F.sum(F.when(F.col("event_type") == PURCHASE, 1).otherwise(0)).alias(
            "purchase_count"
        ),
    )
    agg = agg.withColumn(
        "session_duration_sec",
        (
            F.col("session_end_ts").cast("long")
            - F.col("session_start_ts").cast("long")
        ),
    ).filter(
        F.col("session_duration_sec").isNotNull()
        & (F.col("session_duration_sec") >= 0)
    )
    if customers_clean is not None:
        attrs = customers_clean.select(
            F.col("customer_id").alias("user_id"), "name", "segment"
        )
        agg = agg.join(F.broadcast(attrs), ["user_id"], "left").select(
            *[c for c in agg.columns],
            F.coalesce("name", F.lit("UNKNOWN")).alias("customer_name"),
            F.coalesce("segment", F.lit("UNKNOWN")).alias("segment"),
        )
    return agg


def gold_customer_360(
    customers_clean: DataFrame,
    orders_clean: DataFrame,
    as_of: str = "2026-01-01",
    platinum_threshold: float = 2_000_000.0,
    gold_threshold: float = 1_000_000.0,
) -> DataFrame:
    """Customer-grain rollup: revenue, order count, recency, AOV
    (NULL-when-zero convention), lifecycle tier ladder.

    Reference: customer_360 (03_gold_aggregate.py:226-272) + the
    tiering CASE ladder from analysis/dashboard_queries/
    04_Customer 360.sql:16-21 (thresholds are parameters — the
    reference's 1000/500 literals assume consumer-basket prices; the
    TPC-H-ish fixture's order totals run ~1k-500k). ``current_date``
    is replaced by the ``as_of`` parameter for reproducibility.
    """
    per_customer = orders_clean.groupBy("customer_id").agg(
        dec_sum(F.col("total_usd")).alias("lifetime_revenue"),
        F.count(F.lit(1)).alias("total_orders"),
        F.max("order_date").alias("last_order_date"),
        F.min("order_date").alias("first_order_date"),
    )
    joined = customers_clean.join(per_customer, ["customer_id"], "left")
    revenue = F.coalesce("lifetime_revenue", F.lit(0.0))
    orders_n = F.coalesce("total_orders", F.lit(0))
    return joined.select(
        "customer_id",
        "name",
        "segment",
        revenue.alias("lifetime_revenue"),
        orders_n.cast("long").alias("total_orders"),
        "first_order_date",
        "last_order_date",
        F.datediff(F.lit(as_of).cast("date"), F.col("last_order_date")).alias(
            "days_since_last_order"
        ),
        safe_div_null(revenue, orders_n).alias("avg_order_value"),
        F.when(revenue >= platinum_threshold, "Platinum VIP")
        .when(revenue >= gold_threshold, "Gold Member")
        .when(orders_n > 0, "Standard Customer")
        .otherwise("Window Shopper")
        .alias("customer_tier"),
    )
