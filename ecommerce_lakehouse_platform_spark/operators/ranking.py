"""Distributed total-order ranking without a single-task window.

``Window.orderBy(...)`` with no ``partitionBy`` is the classic Spark
scale trap: the whole input funnels through ONE task to assign global
row numbers (the same anti-pattern the round-2 review flagged in the
IVF centroid pick). This module implements the standard two-pass
alternative:

1. range-partition on the sort key (``repartitionByRange`` — Spark's
   sampled range partitioner, the same machinery behind distributed
   ORDER BY) and sort within partitions;
2. per-partition local ``row_number`` (window partitioned by
   ``spark_partition_id()`` — W parallel tasks, not one);
3. a partition-count side table (W rows — broadcast-sized no matter
   how big the data) turned into exclusive prefix offsets;
4. ``global rank = partition offset + local rank``.

The result is identical to a global ``row_number`` for any total
order (callers must include a unique tiebreak column), but every
stage is parallel: the only single-task step is the prefix sum over
the W-row partition-count table.

Determinism note: the sampled range boundaries can vary, but the
final rank is boundary-independent — a row's rank equals the number
of rows ahead of it in the total order, however the ranges land.

``ntile_from_rank`` reproduces SQL ``NTILE(k)`` semantics (first
``n mod k`` buckets get the extra row) from a precomputed global
rank, so quantile bucketing inherits the same parallel shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Append a 1-based global row number over a total order.

    ``order_cols`` must define a *total* order (include a unique key
    as the last column) — otherwise tied rows get an arbitrary but
    still consistent ordering within the tie.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    # no sortWithinPartitions here: the local-rank window below sorts
    # by (_pid, order_cols) anyway, so a pre-sort would be a wasted pass
    part = df.repartitionByRange(n_part, *order_cols)
    # spark_partition_id() is nondeterministic-flagged, which pins the
    # projection at this point in the plan (it cannot be pushed across
    # the exchange below and re-evaluated against different partitions)
    local = part.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # W rows → the unpartitioned window here is a single task over a
    # broadcast-sized frame, which is the point of the two-pass trick
    off_w = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``NTILE(k)`` from a 1-based global rank and total count.

    NTILE semantics: with ``q = n div k`` and ``r = n mod k``, the
    first ``r`` buckets hold ``q+1`` rows and the rest hold ``q``.
    ``greatest(q, 1)`` guards the (n < k) divisor; that branch is
    never *selected* when q == 0 because rank <= n = r*(q+1) there.
    """
    q = (n / F.lit(k)).cast("long")
    r = n % F.lit(k)
    big = r * (q + 1)
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(
            r + ((rank - 1 - big) / F.greatest(q, F.lit(1))).cast("long") + 1
        )
        .cast("int")
    )
