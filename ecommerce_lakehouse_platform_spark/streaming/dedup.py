"""Streaming deduplication: exactly-once keys from at-least-once
sources.

The reference pipeline is batch-only and handles duplicate deliveries
by rerunning full overwrites (/root/reference/README.md:26-33). The
streaming-native equivalent is state-store dedup on the delivery key:

* ``dedup_stream`` — ``dropDuplicates(keys)`` on an unbounded stream.
  EXACT (any later duplicate is dropped, however late), at the cost of
  state that grows with the distinct-key count. The right call when
  the key space is bounded (per-day ingest ids, replayed epochs).
* ``dedup_stream_within_watermark`` —
  ``dropDuplicatesWithinWatermark(keys)``: state is pruned to the
  watermark horizon, so memory is bounded by the key-arrival rate ×
  delay instead of all history. Contract is weaker — a duplicate
  arriving later than the watermark delay after the original can
  re-emit — which is the standard at-scale trade for at-least-once
  sources whose redeliveries are promptly retried.

Both emit rows on FIRST arrival, so only key-determined columns are
deterministic under redelivery; the bounded harness therefore returns
key columns only.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_run_seq = 0


def dedup_stream(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Exact streaming dedup on ``keys`` (unbounded state)."""
    return stream.dropDuplicates(keys)


def dedup_stream_within_watermark(
    stream: DataFrame, keys: list[str], ts_col: str, delay: str
) -> DataFrame:
    """Watermark-bounded streaming dedup (state pruned past
    ``delay``); ``ts_col`` must be an event-time timestamp column."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def run_stream_dedup_bounded(
    spark: SparkSession, df: DataFrame, keys: list[str]
) -> DataFrame:
    """Run exact streaming dedup over a BOUNDED DataFrame (batch-
    equivalence harness: parquet temp source → availableNow → memory
    sink) and return the deduplicated KEY columns.

    The memory-sink table is driver-resident, so the temp source and
    checkpoint are deleted before returning; state-store partition
    count is pinned low for the bounded run and the session setting
    restored (the count freezes into the checkpoint at creation).
    """
    global _run_seq
    _run_seq += 1
    name = f"stream_dedup_{_run_seq}"

    src = tempfile.mkdtemp(prefix="dedup_src_")
    ckpt = tempfile.mkdtemp(prefix="dedup_ckpt_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        df.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = dedup_stream(stream, keys).select(*keys)
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
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)
