"""Source/sink format round-trips: every format a switcher would
bring data in with (parquet, ORC, JSON-lines, CSV) must round-trip the
silver orders model losslessly under an EXPLICIT schema (the engine
never relies on schema inference off the bronze edge — SURVEY.md §1).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.plans.silver import silver_orders
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _canon(df):
    rows = df.select(
        "order_id", "customer_id", "status", "total_usd",
        F.col("order_date").cast("string").alias("order_date"),
    ).collect()
    return sorted((r[0], r[1], r[2], r[3], r[4]) for r in rows)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_silver_orders_round_trips(spark, fmt):
    base = silver_orders(load_table(spark, SF_SMOKE, "orders")).drop("order_ts")
    tmp = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    try:
        writer = base.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            writer = writer.option("header", True)
        writer.save(tmp)
        reader = spark.read.format(fmt).schema(base.schema)
        if fmt == "csv":
            reader = reader.option("header", True)
        back = reader.load(tmp)
        assert back.schema == base.schema
        assert _canon(back) == _canon(base)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_silver_orders_round_trips_xml(spark):
    """XML (built-in since Spark 4) round-trip under explicit schema;
    rowTag is mandatory on both edges. Avro is NOT bundled in this
    runtime (external spark-avro module) — a switcher bringing Avro
    data needs the package on the classpath; nothing else changes."""
    base = silver_orders(load_table(spark, SF_SMOKE, "orders")).drop("order_ts")
    tmp = tempfile.mkdtemp(prefix="fmt_xml_")
    try:
        base.write.mode("overwrite").format("xml").option(
            "rootTag", "orders"
        ).option("rowTag", "order").save(tmp)
        back = (
            spark.read.format("xml")
            .schema(base.schema)
            .option("rowTag", "order")
            .load(tmp)
        )
        assert back.schema == base.schema
        assert _canon(back) == _canon(base)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
