"""Structured Streaming sessionization: the streaming pipeline must
reproduce the batch ``session_rollup`` results on the same events."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.plans.silver import silver_events
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table
from ecommerce_lakehouse_platform_spark.streaming.sessions import (
    session_rollup,
    streaming_session_metrics,
)
from ecommerce_lakehouse_platform_spark.streaming.stateful import (
    run_stateful_sessions_bounded,
)

from .conftest import SF_SMOKE


def test_streaming_matches_batch_sessionization(spark):
    ev = silver_events(load_table(spark, SF_SMOKE, "events"))
    src_dir = tempfile.mkdtemp(prefix="stream_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        ev.write.mode("overwrite").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(src_dir)
        assert stream.isStreaming
        sess = streaming_session_metrics(stream, gap="30 minutes", watermark="1 hour")
        q = (
            sess.writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.session_start_ts, r.event_count, round(r.session_revenue, 6))
            for r in spark.table("sessions_out").select(
                "user_id", "session_start_ts", "event_count", "session_revenue"
            ).collect()
        }
        want = {
            (r.user_id, r.session_start_ts, r.event_count, round(r.session_revenue, 6))
            for r in session_rollup(ev, "user_id", "event_ts", "30 minutes").collect()
        }
        assert got == want
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_windowed_rollup_matches_batch(spark):
    """Tumbling-window rollup: readStream + watermark must reproduce
    the batch windowed_rollup bit-for-bit (decimal revenue sums)."""
    from ecommerce_lakehouse_platform_spark.streaming.sessions import (
        windowed_rollup,
    )

    ev = silver_events(load_table(spark, SF_SMOKE, "events"))
    src_dir = tempfile.mkdtemp(prefix="stream_win_src_")
    ckpt = tempfile.mkdtemp(prefix="stream_win_ckpt_")
    try:
        ev.write.mode("overwrite").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(src_dir)
        rolled = windowed_rollup(
            stream.withWatermark("event_ts", "1 hour"), "event_ts", "1 hour"
        )
        q = (
            rolled.writeStream.format("memory")
            .queryName("win_rollup_out")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        cols = ["win", "event_type", "n_events", "total_value"]
        got = {
            (r["win"]["start"], r["event_type"], r["n_events"], r["total_value"])
            for r in spark.table("win_rollup_out").select(cols).collect()
        }
        want = {
            (r["win"]["start"], r["event_type"], r["n_events"], r["total_value"])
            for r in windowed_rollup(ev, "event_ts", "1 hour").select(cols).collect()
        }
        assert got == want and got
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_sliding_window_covers_each_event_twice(spark):
    """slide = len/2 → every event lands in exactly two windows."""
    from ecommerce_lakehouse_platform_spark.streaming.sessions import (
        windowed_rollup,
    )

    ev = silver_events(load_table(spark, SF_SMOKE, "events"))
    n = ev.count()
    slid = windowed_rollup(ev, "event_ts", "1 hour", slide="30 minutes")
    total = slid.agg(F.sum("n_events").alias("s")).collect()[0]["s"]
    assert total == 2 * n


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream interval join == the batch inequality
    join on the same bounded events."""
    from ecommerce_lakehouse_platform_spark.streaming.joins import (
        run_stream_stream_join_bounded,
    )

    ev = silver_events(load_table(spark, SF_SMOKE, "events")).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        "event_ts",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("event_ts").alias("error_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("event_ts").alias("purchase_ts"),
    )
    got = {
        (r["user_id"], r["purchase_id"], r["error_id"])
        for r in run_stream_stream_join_bounded(
            spark, errors, purchases, "user_id", "error_ts", "purchase_ts"
        ).collect()
    }
    batch = errors.alias("e").join(
        purchases.alias("p"),
        (F.col("e.user_id") == F.col("p.user_id"))
        & (F.col("e.error_ts") >= F.col("p.purchase_ts"))
        & (F.col("e.error_ts") < F.col("p.purchase_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    want = {
        (r["user_id"], r["purchase_id"], r["error_id"])
        for r in batch.select("e.user_id", "purchase_id", "error_id").collect()
    }
    assert got == want and got


def test_stream_stream_left_outer_join_matches_batch(spark):
    """LEFT OUTER stream-stream join: unmatched errors must surface
    with null purchase columns once the watermark flushes them
    (sentinel-driven in the bounded harness) — and match the batch
    left join exactly."""
    from ecommerce_lakehouse_platform_spark.streaming.joins import (
        run_stream_stream_join_bounded,
    )

    ev = silver_events(load_table(spark, SF_SMOKE, "events")).select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        "event_ts",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("event_ts").alias("error_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("event_ts").alias("purchase_ts"),
    )
    got = {
        (r["user_id"], r["error_id"], r["purchase_id"])
        for r in run_stream_stream_join_bounded(
            spark, errors, purchases, "user_id", "error_ts", "purchase_ts",
            how="left_outer",
        ).collect()
    }
    batch = errors.alias("e").join(
        purchases.alias("p"),
        (F.col("e.user_id") == F.col("p.user_id"))
        & (F.col("e.error_ts") >= F.col("p.purchase_ts"))
        & (F.col("e.error_ts") < F.col("p.purchase_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    want = {
        (r["user_id"], r["error_id"], r["purchase_id"])
        for r in batch.select("e.user_id", "error_id", "purchase_id").collect()
    }
    assert got == want
    assert any(p is None for _, _, p in got)  # outer rows present


def test_stateful_sessionizer_matches_batch_bit_exact(spark):
    """applyInPandasWithState sessionizer == batch session_window,
    including revenue doubles bit-for-bit (integer-micros
    accumulation), with every session flushed by event-time timeout."""
    ev = silver_events(load_table(spark, SF_SMOKE, "events"))
    got = {
        (r.user_id, r.session_start_sec, r.session_end_sec, r.event_count,
         r.session_revenue)
        for r in run_stateful_sessions_bounded(spark, ev).collect()
    }
    want = {
        (r.user_id, r.s, r.e, r.event_count, r.session_revenue)
        for r in session_rollup(ev, "user_id", "event_ts", "30 minutes")
        .select(
            "user_id",
            F.col("session_start_ts").cast("long").alias("s"),
            F.col("session_end_ts").cast("long").alias("e"),
            "event_count",
            "session_revenue",
        )
        .collect()
    }
    assert got == want
