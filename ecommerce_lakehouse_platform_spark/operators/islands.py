"""Gaps-and-islands interval merging.

Merging overlapping/adjacent intervals per key is the "interval
union" primitive behind substring-dedup span extraction (merge the
duplicated n-gram occurrences of Lee et al. into maximal removable
spans), session stitching, and downtime/coverage accounting.

The distributed shape: one window PARTITIONED BY the key (parallel
across keys, sorted by interval start within each), a running-max of
interval ends to detect island breaks — the classic gaps-and-islands
move, generalized to variable-length intervals where ``lag(start)``
alone is wrong — then a cumulative sum of break flags to number the
islands. No global sort, no driver-side state; every step replays
exactly in ANSI SQL, so island outputs stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_islands(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    max_gap: int = 0,
    island_col: str = "island_id",
) -> DataFrame:
    """Merge [start, end] integer intervals per key into islands.

    Two intervals belong to the same island when
    ``start <= running_max(prior ends) + 1 + max_gap`` — with the
    default ``max_gap=0`` that is "overlapping or exactly adjacent";
    a positive ``max_gap`` additionally bridges up to that many
    uncovered units. Appends ``island_col`` (1-based, ordered by
    start within each key); aggregate on it to get per-island spans.

    Interval ends may vary per row (the running max — not ``lag`` —
    makes a long interval absorb later short ones it already covers).
    """
    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk: Column = F.when(
        prev_max_end.isNull()
        | (F.col(start_col) > prev_max_end + 1 + max_gap),
        1,
    ).otherwise(0)
    return df.withColumn(
        island_col,
        F.sum(brk)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
