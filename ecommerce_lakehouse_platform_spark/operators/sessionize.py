"""Gap-based sessionization (batch).

The reference has sessions as a pre-built dim table and sessionizes by
``groupBy("session_id")`` (/root/reference/03_gold/
03_gold_aggregate.py:166); the fixtures have no session ids, so we
derive them: a session is a maximal run of a user's events with no gap
larger than ``gap_seconds`` (identical semantics to Spark's
``session_window`` — the streaming twin in streaming/sessions.py).

Plan shape: one shuffle on ``user_col`` for the lag/cumsum window; the
downstream per-session aggregation reuses the same hash partitioning
(user_col is a prefix of the session key) so AQE can avoid a second
full shuffle. No UDFs, no driver state — scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "event_ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Append ``session_seq`` (per-user 1-based session index) and
    ``session_id`` (user:seq string) to each event row."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col(ts_col).cast("long") - prev_ts.cast("long") > gap_seconds),
        1,
    ).otherwise(0)
    with_seq = events.withColumn("_new_session", is_new).withColumn(
        "session_seq",
        F.sum("_new_session").over(
            Window.partitionBy(user_col)
            .orderBy(F.col(ts_col), F.col(tiebreak_col))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_seq.drop("_new_session").withColumn(
        "session_id",
        F.concat_ws(":", F.col(user_col).cast("string"), F.col("session_seq").cast("string")),
    )
