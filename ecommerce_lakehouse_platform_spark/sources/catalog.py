"""Fixture catalog: named-table access over the driver's parquet dirs.

Mirrors the reference's governed-table access pattern (``spark.table``
helpers at /root/reference/02_silver/02_silver_transform.py:26-27 and
/root/reference/03_gold/03_gold_aggregate.py:18-19) over plain parquet
paths. Reads are plain ``spark.read.parquet`` so Catalyst gets the
vectorized reader, predicate pushdown, and column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import tune_session

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or FIXTURE_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in FIXTURE_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_managed_namespace(
    spark: SparkSession, sf_dir: str, prefix: str = "ecom"
) -> dict[str, list[str]]:
    """The reference's governed three-level namespace
    (``ecom_catalog.{bronze,silver,gold}.*``,
    /root/reference/01_bronze/01_bronze_ingest.py:32-34) as REAL
    databases in the session metastore: ``{prefix}_bronze`` /
    ``{prefix}_silver`` / ``{prefix}_gold``, every layer a managed
    ``saveAsTable`` write, readable as two-part names
    (``spark.table("ecom_silver.orders")``) and enumerable with
    ``SHOW TABLES IN`` — the metastore round-trip the temp-view
    workspace (:func:`register_sql_workspace`) does not exercise.
    Spark's session catalog has no catalog level without an external
    plugin, so the reference's catalog dot drops into the database
    prefix (a naming translation, not a capability gap).

    Bronze materializes the five pipeline source tables (the
    reference's bronze ingest copies raw files into bronze tables,
    01_bronze_ingest.py:22-34); silver and gold are built FROM the
    managed bronze/silver tables via ``spark.table``, exactly like the
    reference's layer-to-layer reads (02_silver_transform.py:26-27).
    Overwrite mode keeps reruns idempotent. Returns
    ``{database: SHOW TABLES IN result}``."""
    from ..plans import gold, silver  # local import to avoid a cycle

    b, s, g = (f"{prefix}_bronze", f"{prefix}_silver", f"{prefix}_gold")
    for db in (b, s, g):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")

    for name in ("customer", "orders", "lineitem", "events", "part"):
        load_table(spark, sf_dir, name).write.mode("overwrite").format(
            "parquet"
        ).saveAsTable(f"{b}.{name}")

    sv = {
        "customers": silver.silver_customers(spark.table(f"{b}.customer")),
        "orders": silver.silver_orders(spark.table(f"{b}.orders")),
        "events": silver.silver_events(spark.table(f"{b}.events")),
        "products": silver.silver_products(spark.table(f"{b}.part")),
    }
    sv["order_items"] = silver.silver_order_items(
        spark.table(f"{b}.lineitem"), sv["orders"]
    )
    for name, df in sv.items():
        df.write.mode("overwrite").format("parquet").saveAsTable(
            f"{s}.{name}"
        )

    st = {name: spark.table(f"{s}.{name}") for name in sv}
    gd = {
        "daily_metrics": gold.gold_daily_metrics(st["events"], st["orders"]),
        "product_metrics": gold.gold_product_metrics(
            st["order_items"], st["products"]
        ),
        "product_funnel": gold.gold_product_funnel(st["events"]),
        "session_metrics": gold.gold_session_metrics(
            st["events"], customers_clean=st["customers"]
        ),
        "customer_360": gold.gold_customer_360(st["customers"], st["orders"]),
    }
    for name, df in gd.items():
        df.write.mode("overwrite").format("parquet").saveAsTable(
            f"{g}.{name}"
        )

    from .writers import list_tables

    return {db: list_tables(spark, db) for db in (b, s, g)}


def register_sql_workspace(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the full three-layer SQL surface as temp views —
    bronze fixtures (raw names), silver models (``silver_*``), and
    gold models (``gold_*``) — so any layer is queryable with plain
    ``spark.sql``. Views are lazy logical plans: nothing materializes
    until a query runs, and Catalyst prunes/pushes through them, so
    registering the workspace costs nothing at any scale.

    Replaces the reference's Unity Catalog namespace
    (ecom_catalog.{bronze,silver,gold}.*) for path-based deployments.
    Returns the registered view names.
    """
    from ..plans import gold, silver  # local import to avoid a cycle

    register_views(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    sv = {
        "silver_customers": silver.silver_customers(t["customer"]),
        "silver_orders": silver.silver_orders(t["orders"]),
        "silver_events": silver.silver_events(t["events"]),
        "silver_products": silver.silver_products(t["part"]),
    }
    sv["silver_order_items"] = silver.silver_order_items(
        t["lineitem"], sv["silver_orders"]
    )
    gd = {
        "gold_daily_metrics": gold.gold_daily_metrics(
            sv["silver_events"], sv["silver_orders"]
        ),
        "gold_product_metrics": gold.gold_product_metrics(
            sv["silver_order_items"], sv["silver_products"]
        ),
        "gold_product_funnel": gold.gold_product_funnel(sv["silver_events"]),
        "gold_session_metrics": gold.gold_session_metrics(
            sv["silver_events"], customers_clean=sv["silver_customers"]
        ),
        "gold_customer_360": gold.gold_customer_360(
            sv["silver_customers"], sv["silver_orders"]
        ),
    }
    for name, df in {**sv, **gd}.items():
        df.createOrReplaceTempView(name)
    return list(FIXTURE_TABLES) + list(sv) + list(gd)
