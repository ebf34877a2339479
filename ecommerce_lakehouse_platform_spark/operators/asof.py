"""As-of (point-in-time) join — an operator Spark's DataFrame API
lacks natively.

For every left row, attach the most recent right row with
``right_ts <= left_ts`` (backward direction) within the same key
group — the temporal-attribution primitive (last touch before an
order, price as of a trade, state as of an event).

Scale-correct implementation: UNION the two sides and take a running
``last(..., ignorenulls=True)`` over one window ordered by
(ts, side) — right rows sort before left rows at equal timestamps, so
the match is inclusive. This is ONE shuffle on the keys and O(1)
window state per row; the naive alternative (range join + per-left
max) explodes to O(|left| × |right per key|) pairs and a second
aggregation. No Spark range-join hint or equality subtlety involved;
the plan survives any key cardinality.

Determinism: right rows that tie on (key, ts) are ordered by
``right_tiebreak`` so the survivor is well-defined (DuckDB's native
ASOF JOIN leaves this unspecified — callers wanting cross-engine
parity should dedupe right to one row per (key, ts), as the registry
query does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    matched_prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of join: left rows keep all columns; the matched
    right row's non-key columns arrive prefixed with
    ``matched_prefix`` (NULL when no right row precedes the left row).
    ``right_tiebreak`` must be a numeric column (ordered as long).
    """
    right_payload = [c for c in right.columns if c not in keys and c != right_ts]
    payload_struct = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in right_payload],
    )

    # side 0 = right, side 1 = left: at equal ts the right row sorts
    # first, so last() sees it — inclusive backward semantics
    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (
            F.col(right_tiebreak).cast("long") if right_tiebreak else F.lit(0)
        ).cast("long").alias("_tb"),
        payload_struct.alias("_r"),
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(0).cast("long").alias("_tb"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in l_cols],
        F.col("_match._rts").alias(f"{matched_prefix}{right_ts}"),
        *[
            F.col(f"_match.{c}").alias(f"{matched_prefix}{c}")
            for c in right_payload
        ],
    )
    return out
