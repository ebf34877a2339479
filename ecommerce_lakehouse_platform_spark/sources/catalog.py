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
