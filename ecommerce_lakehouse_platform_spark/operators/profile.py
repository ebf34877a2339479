"""Table profiling — the one-pass column-statistics scan (row count,
per-column null counts, numeric/date min-max) that backs data-quality
dashboards and ingestion monitoring.

The reference eyeballs `display(df.limit(5))` and row counts
(/root/reference/02_silver/02_silver_transform.py:37,261-273); this is
the systematic version. Everything folds into a single partial+final
aggregate over one scan — no per-column jobs, no collect loops — so
profiling a 100 TB table costs one pass. Min/max/count are
order-independent, so the profile is exactly reproducible cross-engine
without decimal routing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    null_cols: Sequence[str] | None = None,
    minmax_cols: Sequence[str] | None = None,
) -> DataFrame:
    """One-row profile: ``n_rows``, ``<col>_nulls`` for ``null_cols``
    (default: every column), ``<col>_min``/``<col>_max`` for
    ``minmax_cols`` (default: none — pass orderable columns)."""
    nulls = list(null_cols) if null_cols is not None else list(df.columns)
    minmax = list(minmax_cols or [])
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in nulls:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(
                f"{c}_nulls"
            )
        )
    for c in minmax:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.agg(*aggs)
