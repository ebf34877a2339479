"""Bronze CSV ingestion (OP-scan-csv + OP-audit-cols).

The reference ingests 7 CSVs with ``inferSchema`` and stamps lineage
columns (/root/reference/01_bronze/01_bronze_ingest.py:22-37). The new
engine replaces inference with explicit StructType schemas — at 100 TB
an inference pass is a full extra scan, and inferred types drift
between loads; a declared schema is one footer read and deterministic.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..functions.cleaning import audit_columns


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    source_file: str | None = None,
) -> DataFrame:
    """Schema-enforced CSV scan with ingest audit columns."""
    reader = spark.read.option("header", str(header).lower())
    reader = reader.schema(schema)
    df = reader.csv(path)
    return audit_columns(df, source_file or path)


def ingest_bronze(
    spark: SparkSession,
    sources: Mapping[str, tuple[str, StructType | str]],
    write_fn,
) -> dict[str, int]:
    """Loop-ingest named CSV sources → bronze tables (the reference's
    ingest loop, 01_bronze_ingest.py:22-37). ``write_fn(df, name)``
    persists each table; returns per-table row counts."""
    counts: dict[str, int] = {}
    for name, (path, schema) in sources.items():
        df = read_csv(spark, path, schema, source_file=path.rsplit("/", 1)[-1])
        write_fn(df, name)
        counts[name] = df.count()
    return counts
