"""Streaming dedup: exact (unbounded-state) and watermark-bounded
variants against their batch contracts."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.sources.catalog import load_table
from ecommerce_lakehouse_platform_spark.streaming.dedup import (
    dedup_stream_within_watermark,
    run_stream_dedup_bounded,
)


def test_exact_stream_dedup_equals_batch_distinct(spark, sf_dir):
    # load_table applies the nanos-timestamp session tuning the raw
    # events parquet needs under Spark 4
    ev = load_table(spark, sf_dir, "events").select("event_id")
    tripled = ev.unionAll(ev).unionAll(ev)
    out = run_stream_dedup_bounded(spark, tripled, ["event_id"])
    got = {r.event_id for r in out.collect()}
    want = {r.event_id for r in ev.distinct().collect()}
    assert got == want


def test_watermarked_stream_dedup_drops_in_window_duplicates(spark):
    """dropDuplicatesWithinWatermark: duplicates inside the delay
    horizon collapse to one emission; the state store is pruned past
    the watermark (the bounded-memory contract at scale)."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("k1", base),
        ("k1", base + datetime.timedelta(minutes=5)),   # in-window dup
        ("k2", base + datetime.timedelta(minutes=1)),
        ("k2", base + datetime.timedelta(minutes=2)),   # in-window dup
        ("k3", base + datetime.timedelta(minutes=3)),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp")
    src = tempfile.mkdtemp(prefix="wm_dedup_src_")
    ckpt = tempfile.mkdtemp(prefix="wm_dedup_ckpt_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        df.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = dedup_stream_within_watermark(
            stream, ["key"], ts_col="ts", delay="30 minutes"
        ).select("key")
        q = (
            out.writeStream.format("memory")
            .queryName("wm_dedup_probe")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(r.key for r in spark.table("wm_dedup_probe").collect())
        assert got == ["k1", "k2", "k3"]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
