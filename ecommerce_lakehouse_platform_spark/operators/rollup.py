"""Mergeable partial rollups — incremental maintenance of additive
aggregates (the continuous-aggregate / materialized-rollup refresh
pattern).

The reference recomputes every gold table from scratch on each run
(full overwrite, /root/reference/03_gold/03_gold_aggregate.py:24-31).
At 100 TB you cannot: the scalable shape is to keep a partial-state
rollup per grain and fold new deltas in — which is only correct for
aggregates whose state is ADDITIVE (count, decimal sum, min, max:
``merge(a, b) = elementwise ⊕``). Averages derive from sum+count at
read time; exact countDistinct is NOT additive and must either go
through the HLL sketch path (ext_sketch_profile) or a distinct-keyed
sub-rollup.

Sums run in DECIMAL(30,6) state so merge order — which is exactly
what differs between the one-shot and incremental plans — cannot
change the result: the equality ``merge(partials) == direct rollup``
is bit-for-bit, oracle-checked in ext_incremental_rollup.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(30,6)"

__all__ = ["partial_rollup", "merge_rollups", "signed_partial_rollup"]


def partial_rollup(
    df: DataFrame,
    keys: Sequence[str | Column],
    sum_cols: Mapping[str, Column],
    count_col: str = "n_rows",
) -> DataFrame:
    """One grain's additive state: COUNT(*) + exact DECIMAL sums."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c.cast(_DEC)).alias(name) for name, c in sum_cols.items()],
    )


def signed_partial_rollup(
    changes: DataFrame,
    keys: Sequence[str | Column],
    sum_cols: Mapping[str, Column],
    count_col: str = "n_rows",
    change_col: str = "_change_type",
) -> DataFrame:
    """Partial state over a CHANGE FEED: inserts contribute +1/+value,
    deletes contribute -1/-value — additive retraction, the piece that
    lets a rollup follow a table that rewrites or merges rather than
    only appends (``sources/deltalog.MiniDeltaTable.changes`` emits
    exactly this insert/delete stream). The signed state merges with
    ordinary partials through :func:`merge_rollups`; groups whose rows
    all vanished net to a zero count, which the caller filters
    (``n_rows != 0``) to match a from-scratch rollup.

    The product is cast back to the canonical DECIMAL(30,6) state type
    so signed and unsigned partials stay union-compatible."""
    w = F.when(F.col(change_col) == "insert", F.lit(1)).otherwise(F.lit(-1))
    return changes.groupBy(*keys).agg(
        F.sum(w).alias(count_col),
        *[
            F.sum((c.cast(_DEC) * w).cast(_DEC)).alias(name)
            for name, c in sum_cols.items()
        ],
    )


def merge_rollups(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Fold partial states into the combined rollup (same schema).

    ``merge(partial(A), partial(B)) == partial(A ∪ B)`` for additive
    state — the property that lets a 100-TB rollup refresh touch only
    the new partition instead of the whole history.
    """
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    keyset = set(keys)
    measures = [c for c in unioned.columns if c not in keyset]
    assert count_col in measures, f"{count_col} missing from state"
    return unioned.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in measures]
    )
