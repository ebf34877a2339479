"""Local differential-testing harness: replicate the driver's
Spark-vs-DuckDB comparison (row count, column names, order-insensitive
value comparison) so every registry query is validated before the
driver ever runs it.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd

from ecommerce_lakehouse_platform_spark.sources.catalog import FIXTURE_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "␀"
        return repr(v)  # full precision — we target bit-identical doubles
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        # DuckDB DATE surfaces as midnight datetime64; Spark DATE as
        # datetime.date — normalize both to the same ISO form.
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: column mismatch spark={sorted(spdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"{name}: row count spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = normalize(spdf), normalize(oracle_pdf)
    if a != b:
        sa, sb = set(a), set(b)
        only_spark = list(sa - sb)[:3]
        only_oracle = list(sb - sa)[:3]
        problems.append(
            f"{name}: value mismatch ({len(sa - sb)} spark-only, "
            f"{len(sb - sa)} oracle-only) e.g. spark={only_spark} oracle={only_oracle}"
        )
    return problems
