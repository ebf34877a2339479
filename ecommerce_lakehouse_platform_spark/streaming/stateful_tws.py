"""Gap sessionization on the ``transformWithStateInPandas`` API
(Spark 4's arbitrary-state operator, the successor to
``applyInPandasWithState``).

Same contract as streaming/stateful.py — the ``session_window`` merge
rule, O(active-users) fixed-size state, append-on-close, integer
micro-unit revenue for bit-parity with the DECIMAL batch sum — so the
two implementations are differential-testable against each other and
against the batch rollup. What the new API changes:

* state is a named, typed handle (``getValueState``) instead of one
  implicit per-key tuple — multiple independent state variables and
  TTLs become possible;
* session close-by-silence uses explicit EVENT-TIME TIMERS
  (``registerTimer`` / ``handleExpiredTimer``) rather than the
  GroupState timeout — timers are first-class and per-key multiple;
* requires the RocksDB state store provider (state lives off-heap,
  incremental snapshot checkpoints) — which is the provider a
  large-state production job wants anyway.

Runtime note: the TWS Python worker speaks a protobuf protocol to the
JVM state server; ``google.protobuf`` is not installed in this
sandbox, so the end-to-end streaming run is exercised only where the
dependency exists (tests/test_stateful_tws.py skip-gates it). The
processor's merge logic — the code this module owns — is driven
directly with fake state/timer handles in the same test file and must
match the ``session_window`` rule event-for-event.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    _US_PER_SEC,
    _parse_gap_seconds,
)


def _close_row(user: str, start_us: int, end_us: int, n: int, rev_micros: int):
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_start_sec": [start_us // _US_PER_SEC],
            "session_end_sec": [end_us // _US_PER_SEC],
            "event_count": [n],
            "session_revenue": [rev_micros / _US_PER_SEC],
        }
    )


class SessionProcessor(StatefulProcessor):
    """One open session per user in a ValueState; an event-time timer
    at ``session_end + gap`` closes the session once the watermark
    passes (no event can extend it any more)."""

    def __init__(self, gap_us: int) -> None:
        self._gap_us = gap_us
        self._gap_ms = gap_us // 1000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("open_session", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        batches = [p for p in rows if len(p)]
        if not batches:
            return
        pdf = pd.concat(batches) if len(batches) > 1 else batches[0]
        ts_us = (pdf["_ts"].astype("int64") // 1000).to_numpy()
        rev_us = pdf["_rev_micros"].to_numpy()
        order = ts_us.argsort(kind="stable")

        open_sess = list(self._session.get()) if self._session.exists() else None
        for i in order:
            t, r = int(ts_us[i]), int(rev_us[i])
            if open_sess is None:
                open_sess = [t, t, 1, r]
            elif t - open_sess[1] >= self._gap_us:
                yield _close_row(user, *open_sess)
                open_sess = [t, t, 1, r]
            else:
                open_sess[1] = max(open_sess[1], t)
                open_sess[2] += 1
                open_sess[3] += r
        self._session.update(tuple(open_sess))
        # one live timer per key: drop the stale close timer, arm the
        # new one strictly beyond the current watermark
        for stale in self._handle.listTimers():
            self._handle.deleteTimer(stale)
        self._handle.registerTimer(
            max(
                open_sess[1] // 1000 + self._gap_ms,
                timerValues.getCurrentWatermarkInMs() + 1,
            )
        )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if self._session.exists():
            yield _close_row(user, *self._session.get())
            self._session.clear()

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "event_ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    revenue_when: Column | None = None,
) -> DataFrame:
    """``transformWithStateInPandas`` twin of
    ``stateful.sessionize_stateful`` — identical output contract."""
    gap_us = _parse_gap_seconds(gap) * _US_PER_SEC
    revenue = (
        revenue_when
        if revenue_when is not None
        else F.when(
            F.col("event_type") == "purchase", F.col("amount_usd")
        ).otherwise(F.lit(0.0))
    )
    prepared = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        (F.coalesce(revenue, F.lit(0.0)).cast("decimal(30,6)") * _US_PER_SEC)
        .cast("long")
        .alias("_rev_micros"),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_us),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="eventtime",
    )
