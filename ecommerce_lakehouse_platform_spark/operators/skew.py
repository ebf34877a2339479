"""Skew-mitigation utilities for hot join/group keys.

The reference's 'UNKNOWN' session/customer buckets concentrate rows on
one key (/root/reference/03_gold/03_gold_aggregate.py:190,199-201) —
harmless at sample scale, a straggler-maker at 100 TB. AQE's skew-join
splitting handles most cases at runtime; ``salted_join`` is the
explicit fallback for when the skewed side must join a non-broadcast
dim: explode the dim side ×`salt_buckets`, scatter the fact side with
a random-free deterministic salt (hash of a row-unique column), join
on (key, salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, unique_col: str, salt_buckets: int, salt_col: str = "_salt"
) -> DataFrame:
    """Deterministic salt in [0, salt_buckets): hash of a row-unique
    column (no rand() — reruns and retries stay stable)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(unique_col)), F.lit(salt_buckets)).cast("int")
    )


def explode_salts(
    df: DataFrame, salt_buckets: int, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate each row once per salt value (the dim side)."""
    # the generator must be top-level in withColumn (no enclosing cast)
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_unique_col: str,
    how: str = "left",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join robust to skewed ``on`` keys: fact side salted by a
    unique column, dim side exploded across all salts, join on
    keys+salt, salt dropped. Output rows identical to a plain join."""
    salted_fact = with_salt(fact, fact_unique_col, salt_buckets)
    salted_dim = explode_salts(dim, salt_buckets)
    return salted_fact.join(salted_dim, [*on, "_salt"], how).drop("_salt")
