"""Cleansing column expressions (the reference's silver-layer idioms).

Everything here is a pure ``Column`` expression — no UDFs, so the whole
layer stays inside Catalyst codegen and survives any scale.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def clean_id(c: Column | str) -> Column:
    """Normalize a numeric-ish string/number ID to a canonical string.

    Semantics (must hold exactly — reference
    /root/reference/02_silver/02_silver_transform.py:41-42):
      * ``"1050.0"`` → ``"1050"``
      * non-numeric garbage → NULL (double cast fails soft)
      * fractional values truncate toward zero (long cast)
      * NULL propagates

    The reference ran with ANSI off, where ``cast`` fails soft; under
    Spark 4's default ANSI mode the equivalent fail-soft operator is
    ``try_cast``.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.try_cast("double").try_cast("long").cast("string")


def audit_columns(df: DataFrame, source_file: str) -> DataFrame:
    """Stamp ingest lineage columns on every row.

    Reference: /root/reference/01_bronze/01_bronze_ingest.py:28-29.
    """
    return df.withColumn("_ingest_ts", F.current_timestamp()).withColumn(
        "_source_file", F.lit(source_file)
    )


def typed_select(df: DataFrame, spec: Mapping[str, Column]) -> DataFrame:
    """One-shot typed projection: pick + cast + rename, like the
    silver select-projections (/root/reference/02_silver/
    02_silver_transform.py:53-63). ``spec`` maps output name → Column.
    """
    return df.select(*[col.alias(name) for name, col in spec.items()])
