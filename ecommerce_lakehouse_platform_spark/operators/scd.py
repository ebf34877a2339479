"""Slowly-changing-dimension (SCD Type 2) history collapse and
MERGE-style upsert — the incremental-maintenance surface the
reference's full-overwrite pipeline never needed
(/root/reference/01_bronze/01_bronze_ingest.py:34 rewrites every
table), but any switcher running continuous ingest will.

``scd2_collapse`` is the classic gaps-and-islands plan: detect state
changes with ``lag`` per key, number the runs with a cumulative sum,
aggregate each run to a validity interval, then chain ``valid_to``
from the next run's start with ``lead``. Three window passes + one
aggregation, all partitioned by the business key — one shuffle on the
key (Spark reuses the hash partitioning across the window and agg
stages since they share the partition key), no self-joins, no
driver-side state.

``merge_upsert`` is MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED
INSERT expressed as (target ANTI-JOIN source) ∪ source — the
shuffle-once batch formulation that rewrites only logical rows, which
is also exactly what Delta's MERGE compiles to under the hood when
every match updates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_collapse", "snapshot_diff", "merge_upsert"]


def scd2_collapse(
    df: DataFrame,
    key_cols: Sequence[str],
    state_cols: Sequence[str],
    order_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an event/state history into SCD2 validity intervals.

    Returns one row per (key, consecutive-state run) with
    ``valid_from`` (first ``order_col`` of the run), ``valid_to`` (the
    next run's ``valid_from``, NULL for the open run) and
    ``is_current``. ``order_col`` must be totally ordered per key —
    pass ``tiebreak_cols`` when the timestamp alone can tie, or run
    output is nondeterministic (same caveat as the reference's
    keep-latest dedupe, SURVEY.md §2.5).
    """
    keys = list(key_cols)
    states = list(state_cols)
    order = [F.col(order_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)

    changed = F.lit(False)
    for s in states:
        prev = F.lag(F.col(s)).over(w)
        # null-safe inequality: a state transitioning to/from NULL is a change
        changed = changed | ~F.col(s).eqNullSafe(prev)
    first_row = F.row_number().over(w) == 1

    runs = df.withColumn(
        "__run",
        F.sum(F.when(first_row | changed, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    intervals = runs.groupBy(*keys, "__run").agg(
        *[F.min(s).alias(s) for s in states],  # constant within a run
        F.min(order_col).alias("valid_from"),
    )
    w_runs = Window.partitionBy(*keys).orderBy("__run")
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__run")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """CDC-style diff of two snapshot versions: full-outer join on the
    key, keep only rows whose key exists on one side only (insert /
    delete) or whose ``value_cols`` differ null-safely (update).
    Returns the key columns plus ``change_type`` and ``old_<c>`` /
    ``new_<c>`` for each value column. Inverse of :func:`merge_upsert`
    (without deletes): ``snapshot_diff(t, merge_upsert(t, delta))``
    recovers exactly the rows of ``delta`` that changed something."""
    keys = list(key_cols)
    vals = list(value_cols)
    o = old.select(*keys, *vals).alias("o")
    n = new.select(*keys, *vals).alias("n")
    cond = None
    for k in keys:
        c = F.col(f"o.{k}") == F.col(f"n.{k}")
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    o_key, n_key = F.col(f"o.{keys[0]}"), F.col(f"n.{keys[0]}")
    changed = o_key.isNull() | n_key.isNull()
    for v in vals:
        changed = changed | ~F.col(f"o.{v}").eqNullSafe(F.col(f"n.{v}"))
    change = (
        F.when(o_key.isNull(), "insert")
        .when(n_key.isNull(), "delete")
        .otherwise("update")
    )
    return joined.filter(changed).select(
        *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
        change.alias("change_type"),
        *[F.col(f"o.{v}").alias(f"old_{v}") for v in vals],
        *[F.col(f"n.{v}").alias(f"new_{v}") for v in vals],
    )


def merge_upsert(
    target: DataFrame, source: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """MERGE: source rows replace matching target rows; unmatched
    source rows are inserts; unmatched target rows pass through.

    Schemas must match by name. The anti-join keeps only target rows
    whose key is absent from the source, then the full source is
    appended — one shuffle each side, broadcastable when the delta is
    small (the common incremental case)."""
    keys = list(key_cols)
    untouched = target.join(source.select(*keys).distinct(), keys, "left_anti")
    return untouched.unionByName(source)
