"""Numeric conventions shared by gold models and dashboards.

Two deliberate zero-denominator conventions coexist in the reference
(README.md:45-49 there): dashboards return 0.0, the customer-360 AOV
returns NULL. Both are preserved per call-site.

``round2``/``roundn`` use an explicit floor-based half-up so Spark and
any ANSI-SQL oracle engine (DuckDB) produce bit-identical results —
Spark's ROUND is HALF_UP while DuckDB's double ROUND is half-even-ish;
floor(x*10^n + 0.5)/10^n sidesteps the difference for non-negative
inputs.

``dec_sum``/``dec_avg`` aggregate money through DECIMAL so the result
is exact and independent of partition/accumulation order — summing
doubles is order-sensitive and breaks cross-engine hash parity, and at
1000-executor scale even reruns of the same job would differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"


def roundn(c: Column, n: int = 2) -> Column:
    scale = F.lit(float(10**n))
    return (F.floor(c * scale + F.lit(0.5)) / scale).cast("double")


def round2(c: Column) -> Column:
    return roundn(c, 2)


def dec_sum(c: Column) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    return F.sum(c.cast(_DEC)).cast("double")


def dec_avg(c: Column) -> Column:
    """Exact-sum-based average, returned as double (sum/count in double)."""
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).cast("double")


def safe_div_zero(num: Column, den: Column, n: int = 2) -> Column:
    """Dashboard convention: den==0 → 0.0, else round(num/den, n).

    Reference: analysis/dashboard_queries/01_product_performance.sql:10-23.
    """
    return F.when(den == 0, F.lit(0.0)).otherwise(roundn(num / den, n))


def safe_div_null(num: Column, den: Column, n: int = 2) -> Column:
    """Customer-360 AOV convention: den==0 → NULL.

    Reference: /root/reference/03_gold/03_gold_aggregate.py:256-263.
    """
    return F.when(den != 0, roundn(num / den, n)).otherwise(F.lit(None).cast("double"))


def safe_pct_capped(num: Column, den: Column, n: int = 2) -> Column:
    """Funnel convention: percentage capped at 100.0, den==0 → 0.0.

    Reference: /root/reference/03_gold/03_gold_aggregate.py:137-152
    (``least(lit(100.0), round(...))``).
    """
    return F.when(den == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(100.0), roundn(num * 100.0 / den, n))
    )
