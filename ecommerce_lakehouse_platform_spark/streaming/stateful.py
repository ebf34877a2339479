"""Custom stateful streaming operator: gap sessionization with
``applyInPandasWithState``.

``session_window`` (streaming/sessions.py) covers the declarative
case; this module is the *custom stateful operator* path for
semantics the built-in windows cannot express (per-group state
machines, custom merge rules, mid-session emission). It reproduces
the exact ``session_window`` merge rule — events merge while the
inter-event gap is STRICTLY below ``gap`` (the windows must overlap)
— so its output is differential-testable against both the batch
rollup and the DuckDB oracle.

Scale notes (the reference has no streaming at all — this extends
/root/reference/03_gold/03_gold_aggregate.py:166's batch
sessionization to unbounded input):
- state is one fixed-size tuple per OPEN session per user — O(active
  users), bounded by the event-time timeout, never O(events);
- closed sessions emit immediately (append mode) — no unbounded
  result buffering;
- revenue accumulates in integer micro-units so the emitted double
  equals Spark's DECIMAL(30,6)-routed batch sum bit-for-bit — float
  accumulation order can never change the result;
- Arrow batches stream through the Python worker; per-batch memory
  is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id string, session_start_sec long, session_end_sec long, "
    "event_count long, session_revenue double"
)
# one open session per user: bounds + count + revenue in micro-units
STATE_SCHEMA = "start_us long, end_us long, n long, rev_micros long"

_US_PER_SEC = 1_000_000


def _parse_gap_seconds(gap: str) -> int:
    qty, unit = gap.split()
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[
        unit.rstrip("s")
    ]
    return int(qty) * mult


def sessionize_stateful(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "event_ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    revenue_when: Column | None = None,
) -> DataFrame:
    """Gap-sessionize a *streaming* DataFrame with explicit state.

    Returns one row per CLOSED session: closed by a later event
    arriving ``>= gap`` after the session end, or by the event-time
    timeout once the watermark passes ``session_end + gap``.
    """
    gap_us = _parse_gap_seconds(gap) * _US_PER_SEC
    gap_ms = gap_us // 1000

    revenue = (
        revenue_when
        if revenue_when is not None
        else F.when(
            F.col("event_type") == "purchase", F.col("amount_usd")
        ).otherwise(F.lit(0.0))
    )

    def close(user: str, start_us: int, end_us: int, n: int, rev_micros: int):
        return pd.DataFrame(
            {
                "user_id": [user],
                "session_start_sec": [start_us // _US_PER_SEC],
                "session_end_sec": [end_us // _US_PER_SEC],
                "event_count": [n],
                "session_revenue": [rev_micros / _US_PER_SEC],
            }
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            # watermark passed session_end + gap: no event can extend
            # this session any more — emit and clear.
            if state.exists:
                yield close(user, *state.get)
            state.remove()
            return

        batches = [p for p in pdfs if len(p)]
        if not batches:
            return
        pdf = pd.concat(batches) if len(batches) > 1 else batches[0]
        # tz-naive ns in the session timezone → epoch micros (exact:
        # integer division, mirroring silver's nanos→micros truncation)
        ts_us = (pdf["_ts"].astype("int64") // 1000).to_numpy()
        rev_us = pdf["_rev_micros"].to_numpy()
        order = ts_us.argsort(kind="stable")

        open_sess = list(state.get) if state.exists else None
        for i in order:
            t, r = int(ts_us[i]), int(rev_us[i])
            if open_sess is None:
                open_sess = [t, t, 1, r]
            elif t - open_sess[1] >= gap_us:
                yield close(user, *open_sess)
                open_sess = [t, t, 1, r]
            else:
                open_sess[1] = max(open_sess[1], t)
                open_sess[2] += 1
                open_sess[3] += r
        state.update(tuple(open_sess))
        # must be strictly beyond the current watermark or Spark
        # rejects the timeout as already-expired
        state.setTimeoutTimestamp(
            max(open_sess[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )

    prepared = events.withWatermark(ts_col, watermark).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("_ts"),
        # decimal-route *before* Python so each contribution is the
        # exact 6-dp value the batch DECIMAL(30,6) sum sees
        (F.coalesce(revenue, F.lit(0.0)).cast("decimal(30,6)") * _US_PER_SEC)
        .cast("long")
        .alias("_rev_micros"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_SENTINEL_USER = "__wm_sentinel__"
_run_seq = 0


def run_stateful_sessions_bounded(
    spark,
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "event_ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    impl: str = "apply_in_pandas",
) -> DataFrame:
    """Run the stateful sessionizer over a BOUNDED events DataFrame and
    return every session (a batch-equivalence harness; production use
    is ``sessionize_stateful`` on a real stream).

    A single far-future sentinel event drives the watermark past every
    real session close, so the trailing no-data micro-batch fires all
    event-time timeouts and the append-mode output is complete. The
    memory sink materializes on the driver, so the temp source and
    checkpoint are deleted before returning.

    ``impl`` picks the operator: ``apply_in_pandas`` (GroupState
    timeout) or ``transform_with_state`` (Spark 4 StatefulProcessor +
    event-time timers; forces the RocksDB provider it requires and
    restores the session's provider after).
    """
    import datetime
    import shutil
    import tempfile

    global _run_seq
    _run_seq += 1
    name = f"stateful_sessions_{_run_seq}"

    cols = events.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(ts_col).alias("event_ts"),
        F.col("event_type").cast("string").alias("event_type"),
        F.col("amount_usd").cast("double").alias("amount_usd"),
    ).where(F.col("event_ts").isNotNull())
    max_ts = cols.agg(F.max("event_ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(_SENTINEL_USER, max_ts + datetime.timedelta(days=30), "noop", 0.0)],
        schema=cols.schema,
    )

    src = tempfile.mkdtemp(prefix="stateful_src_")
    ckpt = tempfile.mkdtemp(prefix="stateful_ckpt_")
    # state-store partition count is frozen from shuffle.partitions at
    # the checkpoint's first batch; a fresh bounded-input run doesn't
    # need hundreds of state tasks per micro-batch, so pin a small
    # count for this query and restore the session's setting after
    _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
    _ROCKSDB = (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    )
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(_PROVIDER_KEY, None)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        cols.unionByName(sentinel).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(cols.schema).parquet(src)
        if impl == "transform_with_state":
            from .stateful_tws import sessionize_tws

            spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
            out = sessionize_tws(
                stream, "user_id", "event_ts", gap=gap, watermark=watermark
            )
        else:
            out = sessionize_stateful(
                stream, "user_id", "event_ts", gap=gap, watermark=watermark
            )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        if prev_provider is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, prev_provider)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name).where(F.col("user_id") != _SENTINEL_USER)
