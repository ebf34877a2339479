"""Reference-native mode: the reference's OWN seven-table schema, end
to end — so a user of Parthiv7/ecommerce-lakehouse-platform can point
this engine at their existing raw CSVs and get the same silver/gold
tables without remapping anything.

The rest of this repo runs the same operator semantics over the
driver's TPC-H-ish fixtures (plans/silver.py, plans/gold.py, oracle-
checked); this module is the native-schema front end over the exact
column names the reference ingests (/root/reference/01_bronze/
01_bronze_ingest.py:12-20) and transforms (02_silver/
02_silver_transform.py, 03_gold/03_gold_aggregate.py). Everything
reuses the shared column-expression library — one implementation of
clean_id / keep-latest / safe division serves both modes.

Documented determinism deviations (same policy as plans/gold.py):
- dedupe ties on `_ingest_ts` get a deterministic tiebreaker (the PK
  + a full-row hash) instead of the reference's nondeterministic
  arbitrary-row keep (02_silver_transform.py:66-69);
- `F.first(event_date)` → `F.min` (03_gold_aggregate.py:170);
- money sums route through DECIMAL (order-independent);
- wall-clock (`current_date`/`current_timestamp`,
  03_gold_aggregate.py:264-267) is an explicit `as_of` parameter.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import clean_id, typed_select
from ..functions.math import dec_sum, round2, safe_div_null, safe_pct_capped
from ..operators.dedupe import keep_latest
from ..operators.dq import CheckResult, expect
from ..sources.csv import read_csv

# Explicit bronze schemas for the reference's seven sources
# (01_bronze_ingest.py:12-20 names them; the silver projections at
# 02_silver_transform.py pin the columns). events.csv / sessions.csv
# are absent from the repo snapshot (.MISSING_LARGE_BLOBS) but their
# schemas are recoverable from the silver selects.
BRONZE_SCHEMAS: dict[str, str] = {
    "customers": (
        "customer_id BIGINT, name STRING, email STRING, country STRING, "
        "age INT, signup_date DATE, marketing_opt_in BOOLEAN"
    ),
    "orders": (
        "order_id BIGINT, customer_id BIGINT, order_time TIMESTAMP, "
        "payment_method STRING, discount_pct DOUBLE, subtotal_usd DOUBLE, "
        "total_usd DOUBLE, country STRING, device STRING, source STRING"
    ),
    "order_items": (
        "order_id BIGINT, product_id BIGINT, unit_price_usd DOUBLE, "
        "quantity INT, line_total_usd DOUBLE"
    ),
    "products": (
        "product_id BIGINT, category STRING, name STRING, "
        "price_usd DOUBLE, cost_usd DOUBLE, margin_usd DOUBLE"
    ),
    "reviews": (
        "review_id BIGINT, order_id BIGINT, product_id BIGINT, "
        "rating INT, review_text STRING, review_time TIMESTAMP"
    ),
    "events": (
        "event_id BIGINT, session_id BIGINT, timestamp TIMESTAMP, "
        "event_type STRING, product_id BIGINT, qty INT, cart_size INT, "
        "payment STRING, discount_pct DOUBLE, amount_usd DOUBLE"
    ),
    "sessions": (
        "session_id BIGINT, customer_id BIGINT, start_time TIMESTAMP, "
        "device STRING, source STRING, country STRING"
    ),
}

_AUDIT = ("_ingest_ts", "_source_file")


def _audit_cols(df: DataFrame) -> dict[str, Column]:
    return {c: F.col(c) for c in _AUDIT}


def _dedupe_latest(df: DataFrame, pk: list[str]) -> DataFrame:
    """Reference keep-latest (02_silver_transform.py:66-69) with a
    deterministic tiebreak: within one ingest batch every row carries
    the same `_ingest_ts`, so the reference keeps an arbitrary row —
    here ties resolve by a stable full-row hash."""
    tiebreak = F.xxhash64(*[F.col(c) for c in df.columns])
    return keep_latest(df, pk, [F.col("_ingest_ts"), tiebreak])


# --- silver models (02_silver_transform.py) --------------------------------

def ref_customers_clean(bronze: DataFrame) -> DataFrame:
    """customers_clean — 02_silver_transform.py:51-69."""
    out = typed_select(
        bronze,
        {
            "customer_id": clean_id("customer_id"),
            "name": F.trim("name"),
            "email": F.lower(F.trim("email")),
            "country": F.trim("country"),
            "age": F.col("age").cast("int"),
            "signup_date": F.to_date("signup_date"),
            "marketing_opt_in": F.col("marketing_opt_in"),
            **_audit_cols(bronze),
        },
    ).filter(F.col("customer_id").isNotNull())
    return _dedupe_latest(out, ["customer_id"])


def ref_events_clean(bronze: DataFrame) -> DataFrame:
    """events_clean — 02_silver_transform.py:80-104."""
    out = (
        typed_select(
            bronze,
            {
                "event_id": clean_id("event_id"),
                "session_id": clean_id("session_id"),
                "event_ts": F.to_timestamp("timestamp"),
                "event_type": F.trim("event_type"),
                "product_id": clean_id("product_id"),
                "qty": F.col("qty").cast("int"),
                "cart_size": F.col("cart_size").cast("int"),
                "payment": F.col("payment"),
                "discount_pct": F.col("discount_pct").cast("double"),
                "amount_usd": F.col("amount_usd").cast("double"),
                **_audit_cols(bronze),
            },
        )
        .withColumn("event_date", F.to_date("event_ts"))
        .filter(F.col("event_id").isNotNull())
    )
    return _dedupe_latest(out, ["event_id"])


def ref_orders_clean(bronze: DataFrame) -> DataFrame:
    """orders_clean — 02_silver_transform.py:113-137."""
    out = (
        typed_select(
            bronze,
            {
                "order_id": clean_id("order_id"),
                "customer_id": clean_id("customer_id"),
                "order_ts": F.to_timestamp("order_time"),
                "payment_method": F.trim("payment_method"),
                "discount_pct": F.col("discount_pct").cast("double"),
                "subtotal_usd": F.col("subtotal_usd").cast("double"),
                "total_usd": F.col("total_usd").cast("double"),
                "country": F.trim("country"),
                "device": F.trim("device"),
                "source": F.trim("source"),
                **_audit_cols(bronze),
            },
        )
        .withColumn("order_date", F.to_date("order_ts"))
        .filter(F.col("order_id").isNotNull())
    )
    return _dedupe_latest(out, ["order_id"])


def ref_order_items_clean(bronze: DataFrame, orders_clean: DataFrame) -> DataFrame:
    """order_items_clean — 02_silver_transform.py:146-174: typed
    projection, positive-quantity filter, order_date backfill via left
    join to orders (coalesce to ingest date), composite-key dedupe."""
    out = typed_select(
        bronze,
        {
            "order_id": clean_id("order_id"),
            "product_id": clean_id("product_id"),
            "unit_price_usd": F.col("unit_price_usd").cast("double"),
            "quantity": F.col("quantity").cast("int"),
            "line_total_usd": F.col("line_total_usd").cast("double"),
            **_audit_cols(bronze),
        },
    ).filter(F.col("order_id").isNotNull() & (F.col("quantity") > 0))
    with_date = out.join(
        F.broadcast(orders_clean.select("order_id", "order_date")),
        ["order_id"],
        "left",
    ).withColumn(
        "order_date", F.coalesce(F.col("order_date"), F.to_date("_ingest_ts"))
    )
    return _dedupe_latest(with_date, ["order_id", "product_id"])


def ref_products_clean(bronze: DataFrame) -> DataFrame:
    """products_clean — 02_silver_transform.py:183-200 (no null-PK
    filter in the reference; preserved)."""
    out = typed_select(
        bronze,
        {
            "product_id": clean_id("product_id"),
            "category": F.trim("category"),
            "product_name": F.trim("name"),
            "price_usd": F.col("price_usd").cast("double"),
            "cost_usd": F.col("cost_usd").cast("double"),
            "margin_usd": F.col("margin_usd").cast("double"),
            **_audit_cols(bronze),
        },
    )
    return _dedupe_latest(out, ["product_id"])


def ref_reviews_clean(bronze: DataFrame) -> DataFrame:
    """reviews_clean — 02_silver_transform.py:211-228."""
    out = typed_select(
        bronze,
        {
            "review_id": clean_id("review_id"),
            "order_id": clean_id("order_id"),
            "product_id": clean_id("product_id"),
            "rating": F.col("rating").cast("int"),
            "review_text": F.col("review_text"),
            "review_ts": F.to_timestamp("review_time"),
            **_audit_cols(bronze),
        },
    ).filter(F.col("review_id").isNotNull())
    return _dedupe_latest(out, ["review_id"])


def ref_sessions_clean(bronze: DataFrame) -> DataFrame:
    """sessions_clean — 02_silver_transform.py:239-250 (no filter, no
    dedupe in the reference; preserved)."""
    return typed_select(
        bronze,
        {
            "session_id": clean_id("session_id"),
            "customer_id": clean_id("customer_id"),
            "session_start_ts": F.to_timestamp("start_time"),
            "device": F.trim("device"),
            "source": F.trim("source"),
            "country": F.trim("country"),
            **_audit_cols(bronze),
        },
    )


# --- gold models (03_gold_aggregate.py) -------------------------------------

def ref_product_metrics(
    events_clean: DataFrame,
    order_items_clean: DataFrame,
    products_clean: DataFrame,
    reviews_clean: DataFrame,
) -> DataFrame:
    """product_metrics — 03_gold_aggregate.py:48-110: daily event
    interactions ⟗ daily sales on (event_date, product_id) with
    zero-coalesce, then ⟕ product attributes and ⟕ per-product review
    aggregates. Gold re-cleans already-clean IDs (defensive,
    idempotent; :48-49 etc.) — preserved."""
    event_metrics = (
        events_clean.withColumn("product_id", clean_id("product_id"))
        .groupBy("event_date", "product_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "page_view", 1).otherwise(0)).alias(
                "view_count"
            ),
            F.sum(F.when(F.col("event_type") == "add_to_cart", 1).otherwise(0)).alias(
                "cart_count"
            ),
        )
    )
    order_metrics = (
        order_items_clean.withColumn("product_id", clean_id("product_id"))
        .groupBy("order_date", "product_id")
        .agg(
            dec_sum(F.col("line_total_usd")).alias("total_revenue"),
            F.sum("quantity").alias("purchase_count"),
        )
        .withColumnRenamed("order_date", "event_date")
    )
    attrs = products_clean.withColumn("product_id", clean_id("product_id")).select(
        "product_id", "category", "product_name"
    )
    review_metrics = (
        reviews_clean.withColumn("product_id", clean_id("product_id"))
        .groupBy("product_id")
        .agg(
            F.avg("rating").alias("avg_rating"),
            F.count("review_id").alias("review_count"),
        )
    )
    return (
        event_metrics.join(order_metrics, ["event_date", "product_id"], "full_outer")
        .select(
            "event_date",
            "product_id",
            F.coalesce("view_count", F.lit(0)).cast("int").alias("view_count"),
            F.coalesce("cart_count", F.lit(0)).cast("int").alias("cart_count"),
            F.coalesce("purchase_count", F.lit(0)).cast("int").alias("purchase_count"),
            F.coalesce("total_revenue", F.lit(0.0)).cast("double").alias(
                "total_revenue"
            ),
        )
        .join(F.broadcast(attrs), ["product_id"], "left")
        .join(review_metrics, ["product_id"], "left")
        .select(
            "event_date",
            "product_id",
            "product_name",
            "category",
            "view_count",
            "cart_count",
            "purchase_count",
            "total_revenue",
            round2(F.coalesce("avg_rating", F.lit(0.0))).alias("avg_rating"),
            F.coalesce("review_count", F.lit(0)).cast("int").alias("review_count"),
        )
        .filter(F.col("product_id").isNotNull())
    )


def ref_product_funnel(product_metrics: DataFrame) -> DataFrame:
    """product_funnel — 03_gold_aggregate.py:124-155: capped safe
    percentages per (event_date, product_id)."""
    return product_metrics.select(
        "event_date",
        "product_id",
        "product_name",
        "category",
        "view_count",
        "cart_count",
        "purchase_count",
        safe_pct_capped(F.col("cart_count"), F.col("view_count")).alias(
            "view_to_cart_pct"
        ),
        safe_pct_capped(F.col("purchase_count"), F.col("cart_count")).alias(
            "cart_to_purchase_pct"
        ),
        safe_pct_capped(F.col("purchase_count"), F.col("view_count")).alias(
            "overall_conversion_pct"
        ),
    )


def ref_session_metrics(
    events_clean: DataFrame, sessions_clean: DataFrame
) -> DataFrame:
    """session_metrics — 03_gold_aggregate.py:163-211: per-session
    event rollup ⟕ session attributes with UNKNOWN defaults, duration
    from epoch-second subtraction, non-negative-duration filter."""
    agg = events_clean.groupBy("session_id").agg(
        F.min("event_ts").alias("session_start_ts_events"),
        F.max("event_ts").alias("session_end_ts"),
        F.count("event_id").alias("total_events"),
        F.min("event_date").alias("session_date"),
        dec_sum(
            F.when(F.col("event_type") == "purchase", F.col("amount_usd")).otherwise(
                F.lit(0.0)
            )
        ).alias("session_revenue"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "has_purchased"
        ),
    )
    attrs = sessions_clean.select(
        "session_id",
        "customer_id",
        "device",
        "source",
        "country",
        F.col("session_start_ts").alias("session_start_ts_sessions"),
    )
    start = F.coalesce("session_start_ts_events", "session_start_ts_sessions")
    return (
        agg.join(attrs, ["session_id"], "left")
        .select(
            "session_id",
            F.coalesce("customer_id", F.lit("UNKNOWN")).alias("customer_id"),
            "session_date",
            start.alias("session_start_ts"),
            "session_end_ts",
            (F.col("session_end_ts").cast("long") - start.cast("long")).alias(
                "session_duration_sec"
            ),
            "total_events",
            F.coalesce("device", F.lit("UNKNOWN")).alias("device"),
            F.coalesce("source", F.lit("UNKNOWN")).alias("source"),
            F.coalesce("country", F.lit("UNKNOWN")).alias("country"),
            F.col("session_revenue").cast("double"),
            F.col("has_purchased").cast("int"),
        )
        .filter(
            F.col("session_duration_sec").isNotNull()
            & (F.col("session_duration_sec") >= 0)
        )
    )


def ref_customer_360(
    session_metrics: DataFrame,
    customers_clean: DataFrame,
    as_of: str = "2026-01-01",
) -> DataFrame:
    """customer_360 — 03_gold_aggregate.py:226-272: per-customer
    session rollup ⟕ demographics, zero-coalesce, NULL-AOV convention,
    recency vs ``as_of`` (replaces the reference's wall clock).
    "total_orders" counts purchase *events*, not orders (:177,229) —
    preserved."""
    per_customer = session_metrics.groupBy("customer_id").agg(
        dec_sum(F.col("session_revenue")).alias("customer_total_revenue"),
        F.sum("has_purchased").alias("total_orders"),
        F.countDistinct("session_id").alias("total_sessions"),
        F.max("session_end_ts").alias("last_active_ts"),
        F.min("session_start_ts").alias("first_active_ts"),
    )
    demo = customers_clean.select(
        "customer_id", "name", "email", "country", "age", "signup_date",
        "marketing_opt_in",
    )
    revenue = F.coalesce("customer_total_revenue", F.lit(0.0))
    orders_n = F.coalesce("total_orders", F.lit(0))
    return (
        demo.join(per_customer, ["customer_id"], "left")
        .select(
            "customer_id",
            "name",
            "email",
            "country",
            "age",
            "signup_date",
            "marketing_opt_in",
            revenue.alias("customer_total_revenue"),
            orders_n.cast("int").alias("total_orders"),
            F.coalesce("total_sessions", F.lit(0)).cast("int").alias(
                "total_sessions"
            ),
            "first_active_ts",
            "last_active_ts",
            safe_div_null(revenue, orders_n).alias("average_order_value"),
            F.datediff(F.lit(as_of).cast("date"), F.col("signup_date")).alias(
                "days_since_signup"
            ),
            F.lit(as_of).cast("date").cast("timestamp").alias("scd_load_ts"),
        )
        .filter(F.col("customer_id").isNotNull())
    )


# --- dashboard SQL (analysis/dashboard_queries/*.sql) -----------------------
# The reference's four parameterized BI queries, re-pointed from
# ecom_catalog.gold.* at temp views over the native gold models and
# executed as parameterized Spark SQL (named :start_date/:end_date
# args — the Databricks-SQL parameter mechanism's OSS equivalent).

REFERENCE_DASHBOARD_SQL: dict[str, str] = {
    # 01_product_performance.sql: category/product rollup with
    # zero-safe rates, top 100 by revenue.
    "product_performance": """
        SELECT category, product_name,
            SUM(view_count) AS total_views,
            SUM(cart_count) AS total_carts,
            SUM(purchase_count) AS total_purchases,
            SUM(total_revenue) AS total_revenue,
            CASE WHEN SUM(view_count) = 0 THEN 0.0
                 ELSE ROUND(SUM(cart_count) * 100.0 / SUM(view_count), 2)
            END AS view_to_cart_rate,
            CASE WHEN SUM(cart_count) = 0 THEN 0.0
                 ELSE ROUND(SUM(purchase_count) * 100.0 / SUM(cart_count), 2)
            END AS cart_to_purchase_rate,
            CASE WHEN SUM(view_count) = 0 THEN 0.0
                 ELSE ROUND(SUM(purchase_count) * 100.0 / SUM(view_count), 2)
            END AS overall_conversion_rate
        FROM ref_product_metrics
        WHERE event_date BETWEEN TRY_CAST(:start_date AS DATE)
                             AND TRY_CAST(:end_date AS DATE)
        GROUP BY 1, 2
        ORDER BY total_revenue DESC, category, product_name
        LIMIT 100
    """,
    # 02_Sales Overview.sql: daily revenue / AOV / traffic.
    "sales_overview": """
        SELECT session_date,
            COUNT(DISTINCT session_id) AS total_sessions,
            SUM(has_purchased) AS total_orders,
            ROUND(SUM(session_revenue), 2) AS total_revenue,
            CASE WHEN SUM(has_purchased) = 0 THEN 0.0
                 ELSE ROUND(SUM(session_revenue) / SUM(has_purchased), 2)
            END AS daily_aov,
            CASE WHEN COUNT(DISTINCT session_id) = 0 THEN 0.0
                 ELSE ROUND(SUM(has_purchased) * 100.0
                            / COUNT(DISTINCT session_id), 2)
            END AS session_conversion_rate
        FROM ref_session_metrics
        WHERE session_date BETWEEN TRY_CAST(:start_date AS DATE)
                               AND TRY_CAST(:end_date AS DATE)
        GROUP BY 1
        ORDER BY 1 DESC
    """,
    # 03_Site Wide Funnel.sql: three labeled grand totals.
    "site_wide_funnel": """
        WITH w AS (
          SELECT view_count, cart_count, purchase_count
          FROM ref_product_metrics
          WHERE event_date BETWEEN TRY_CAST(:start_date AS DATE)
                               AND TRY_CAST(:end_date AS DATE)
        )
        SELECT '1. Product Views' AS funnel_stage, SUM(view_count) AS count FROM w
        UNION ALL
        SELECT '2. Add to Carts', SUM(cart_count) FROM w
        UNION ALL
        SELECT '3. Purchases', SUM(purchase_count) FROM w
        ORDER BY count DESC, funnel_stage
    """,
    # 04_Customer 360.sql: VIP/churn tiering over the active window.
    "customer_360": """
        SELECT customer_id, name, country, total_orders,
            ROUND(customer_total_revenue, 2) AS lifetime_revenue,
            average_order_value,
            days_since_signup,
            CAST(last_active_ts AS DATE) AS last_active_date,
            CASE WHEN customer_total_revenue >= 1000 THEN 'Platinum VIP'
                 WHEN customer_total_revenue >= 500 THEN 'Gold Member'
                 WHEN total_orders > 0 THEN 'Standard Customer'
                 ELSE 'Window Shopper'
            END AS customer_tier
        FROM ref_customer_360
        WHERE CAST(last_active_ts AS DATE)
              BETWEEN TRY_CAST(:start_date AS DATE)
                  AND TRY_CAST(:end_date AS DATE)
        ORDER BY lifetime_revenue DESC, customer_id
        LIMIT 1000
    """,
}


def run_reference_dashboards(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    start_date: str,
    end_date: str,
) -> dict[str, DataFrame]:
    """Run the reference's four dashboard queries over the native gold
    models with named parameters. The funnel reuses one scan via a CTE
    (the per-branch re-scan in the original is an I/O bug at scale;
    rows are identical), and every LIMIT carries a deterministic
    tiebreak."""
    for name in ("product_metrics", "session_metrics", "customer_360"):
        tables[name].createOrReplaceTempView(f"ref_{name}")
    args = {"start_date": start_date, "end_date": end_date}
    return {
        name: spark.sql(q, args=args)
        for name, q in REFERENCE_DASHBOARD_SQL.items()
    }


# --- end-to-end runner -------------------------------------------------------

def run_reference_native(
    spark: SparkSession,
    raw_dir: str,
    as_of: str = "2026-01-01",
    raise_on_dq_failure: bool = True,
) -> tuple[dict[str, DataFrame], list[CheckResult]]:
    """Ingest the reference's raw CSVs → silver → gold → DQ gate.

    Sources missing on disk (the repo snapshot ships 5 of 7 — events/
    sessions were stripped, .MISSING_LARGE_BLOBS:1) become empty typed
    frames so every downstream model still materializes with its full
    schema. Returns ({table: DataFrame}, [DQ results]); DQ checks are
    the reference's four (04_data_quality_checks.py)."""
    bronze: dict[str, DataFrame] = {}
    for name, schema in BRONZE_SCHEMAS.items():
        path = os.path.join(raw_dir, f"{name}.csv")
        if os.path.exists(path):
            bronze[name] = read_csv(spark, path, schema, source_file=f"{name}.csv")
        else:
            empty = spark.createDataFrame([], schema)
            bronze[name] = empty.withColumn(
                "_ingest_ts", F.current_timestamp()
            ).withColumn("_source_file", F.lit(f"{name}.csv"))

    t: dict[str, DataFrame] = {}
    t["customers_clean"] = ref_customers_clean(bronze["customers"])
    t["orders_clean"] = ref_orders_clean(bronze["orders"])
    t["order_items_clean"] = ref_order_items_clean(
        bronze["order_items"], t["orders_clean"]
    )
    t["events_clean"] = ref_events_clean(bronze["events"])
    t["products_clean"] = ref_products_clean(bronze["products"])
    t["reviews_clean"] = ref_reviews_clean(bronze["reviews"])
    t["sessions_clean"] = ref_sessions_clean(bronze["sessions"])

    t["product_metrics"] = ref_product_metrics(
        t["events_clean"], t["order_items_clean"], t["products_clean"],
        t["reviews_clean"],
    )
    t["product_funnel"] = ref_product_funnel(t["product_metrics"])
    t["session_metrics"] = ref_session_metrics(
        t["events_clean"], t["sessions_clean"]
    )
    t["customer_360"] = ref_customer_360(
        t["session_metrics"], t["customers_clean"], as_of=as_of
    )

    checks = [
        expect(
            t["product_metrics"],
            "gold_product_integrity",
            F.col("product_name").isNull() | F.col("category").isNull(),
            raise_on_failure=raise_on_dq_failure,
        ),
        expect(
            t["customer_360"].groupBy("customer_id").count(),
            "customer_360_pk_unique",
            F.col("count") > 1,
            raise_on_failure=raise_on_dq_failure,
        ),
        expect(
            t["session_metrics"],
            "no_negative_duration_or_revenue",
            (F.col("session_duration_sec") < 0) | (F.col("session_revenue") < 0),
            raise_on_failure=raise_on_dq_failure,
        ),
        expect(
            t["product_funnel"],
            "funnel_rates_bounded",
            (F.col("view_to_cart_pct") > 100)
            | (F.col("cart_to_purchase_pct") > 100),
            raise_on_failure=raise_on_dq_failure,
        ),
    ]
    return t, checks
