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


def _range_partitioned(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """Range-partition on the sort key and stamp each row with its
    physical partition id. Exposed separately so plan tests can pin
    the rangepartitioning exchange on the pre-persist frame."""
    n_part = df.sparkSession.sparkContext.defaultParallelism
    # no sortWithinPartitions here: the local-rank window downstream
    # sorts by (_pid, order_cols) anyway, so a pre-sort would be a
    # wasted pass
    part = df.repartitionByRange(n_part, *order_cols)
    # spark_partition_id() is nondeterministic-flagged, which pins the
    # projection at this point in the plan (it cannot be pushed across
    # the exchange and re-evaluated against different partitions)
    return part.withColumn("_pid", F.spark_partition_id())


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
) -> DataFrame:
    """Append a 1-based global row number over a total order.

    ``order_cols`` must define a *total* order (include a unique key
    as the last column) — otherwise tied rows get an arbitrary but
    still consistent ordering within the tie.

    The range-partitioned frame is ``persist()``ed before it fans out
    to the two consumers (the local-rank branch and the per-partition
    count branch). This is a correctness requirement, not a perf
    tweak: ``repartitionByRange`` SAMPLES its boundaries, and without
    materialization the two consumer subtrees can be planned as two
    separate exchanges (column pruning makes them non-identical, so
    ReusedExchange cannot be assumed) whose independent samples assign
    rows to DIFFERENT partitions — per-partition counts would then be
    joined against ranks from a different partitioning, silently
    corrupting the global rank. The persisted InMemoryRelation is one
    RDD with one RangePartitioner instance, so every consumer sees the
    same ``_pid``; its boundaries are computed once at job submission
    and reused even when a lost cached partition is recomputed.

    Cache discipline: one MEMORY_AND_DISK entry per call, bounded by
    the input frame. Loopy callers should ``spark.catalog.clearCache()``
    between invocations (bench.py does) or unpersist via the returned
    frame's lineage.
    """
    part = _range_partitioned(df, order_cols).persist()
    local = part.withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order_cols)),
    )
    counts = part.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
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


def _idiv(a: Column, b: Column) -> Column:
    """Exact integral division of non-negative longs (`div`, the SQL
    IntegralDivide). Double division + cast-truncation is only exact
    while operands stay within 2^53; integer division is exact at any
    BIGINT magnitude."""
    return F.call_function("div", a.cast("long"), b.cast("long"))


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``NTILE(k)`` from a 1-based global rank and total count.

    NTILE semantics: with ``q = n div k`` and ``r = n mod k``, the
    first ``r`` buckets hold ``q+1`` rows and the rest hold ``q``.
    ``greatest(q, 1)`` guards the (n < k) divisor; that branch is
    never *selected* when q == 0 because rank <= n = r*(q+1) there.
    All arithmetic is integral (``div``), so bucketing stays exact
    past 2^53 rows where a 1-ULP double round-up would mis-bucket.
    """
    q = _idiv(n, F.lit(k))
    r = n % F.lit(k)
    big = r * (q + 1)
    return (
        F.when(rank <= big, _idiv(rank - 1, q + 1) + 1)
        .otherwise(r + _idiv(rank - 1 - big, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )


def global_rank_with_ties(
    df: DataFrame,
    order_cols: list[Column],
    tie_cols: list[str],
    rank_col: str = "rank",
    dense_col: str | None = None,
) -> DataFrame:
    """Append SQL ``RANK()`` (and optionally ``DENSE_RANK()``) over a
    global total order WITHOUT a single-task window.

    ``order_cols`` must extend ``tie_cols``' ordering with a unique
    tiebreak (for the row_number pass); ``tie_cols`` name the columns
    whose equal values share a rank. RANK = min row_number within the
    tie group, recovered with one aggregation on the tie key and a
    join back — both partitioned on the tie key, so the only global
    structure is the same W-row offset table ``global_row_number``
    already uses. DENSE_RANK ranks the tie groups themselves: the
    group relation is |distinct tie values|-sized, re-ranked with the
    same two-pass trick, never the data.
    """
    rn = global_row_number(df, order_cols, rank_col="_rn")
    mins = rn.groupBy(*tie_cols).agg(F.min("_rn").alias(rank_col))
    out = rn.join(mins, tie_cols).drop("_rn")
    if dense_col is not None:
        groups = global_row_number(
            mins.select(rank_col).distinct(),
            [F.col(rank_col)],
            rank_col=dense_col,
        )
        out = out.join(groups, [rank_col])
    return out


def percent_rank_from_rank(rank: Column, n: Column) -> Column:
    """SQL ``PERCENT_RANK()`` from a tie-aware global rank and total
    count: ``(rank - 1) / (n - 1)``, 0.0 for the single-row frame.
    Plain IEEE double division of exact BIGINTs — identical in any
    engine."""
    return F.when(n == 1, F.lit(0.0)).otherwise(
        (rank - F.lit(1)).cast("double") / (n - F.lit(1)).cast("double")
    )
