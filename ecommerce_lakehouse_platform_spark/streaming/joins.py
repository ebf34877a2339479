"""Stream-stream interval join — joining two live streams on a key
plus an event-time range, with watermarks bounding both sides' join
state.

The reference joins only static tables
(/root/reference/03_gold/03_gold_aggregate.py:78-92); its streaming
twin for "errors within an hour of a purchase" style correlation is a
watermarked stream-stream join. Spark buffers each side's rows in the
state store and needs BOTH a watermark on each input and a time-range
join condition to know when buffered rows can never match again and
can be evicted — without the range condition the state grows without
bound (the 100-TB failure mode).

Batch equivalence: the same join condition over the same bounded data
equals the batch interval join (operators/rangejoin.py executes that
one as a bucketed equi-join; the streaming planner keeps the range as
a join predicate and prunes with the watermark instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_run_seq = 0


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where ``left_ts`` lands in
    ``[right_ts, right_ts + window)``. ``how`` may be ``inner`` or
    ``left_outer`` (outer nulls emit once the watermark proves no
    match can still arrive).

    Column names (other than ``key``) must be disjoint. Both inputs
    get ``withWatermark``; the range condition gives the state store
    its eviction bound (left state is held ~``window`` + watermark,
    right state ~watermark).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"l.{left_ts}") >= F.col(f"r.{right_ts}"))
        & (
            F.col(f"l.{left_ts}")
            < F.col(f"r.{right_ts}") + F.expr(f"INTERVAL {window}")
        )
    )
    return l.join(r, cond, how).drop(F.col(f"r.{key}"))


def run_stream_stream_join_bounded(
    spark,
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Run the stream-stream join over BOUNDED inputs via a real
    Structured Streaming job (parquet temp sources, availableNow,
    memory sink) and return the complete match set — the
    batch-equivalence harness; production use is
    ``stream_stream_interval_join`` on real streams. Inner joins emit
    every match once both sides' rows have arrived, so no sentinel is
    needed (watermarks only drive state eviction there). LEFT OUTER
    null-rows only emit when the watermark passes their match window,
    so a far-future sentinel row is appended to BOTH sides (keyed off
    the valid id space) to flush every real unmatched row before the
    trailing no-data micro-batch ends; sentinel rows are filtered from
    the returned frame."""
    import datetime
    import shutil
    import tempfile

    global _run_seq
    _run_seq += 1
    name = f"stream_join_{_run_seq}"

    src_l = tempfile.mkdtemp(prefix="ssj_left_")
    src_r = tempfile.mkdtemp(prefix="ssj_right_")
    ckpt = tempfile.mkdtemp(prefix="ssj_ckpt_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    sentinel_key = None
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        if how != "inner":
            far = (
                left.agg(F.max(left_ts)).first()[0]
                + datetime.timedelta(days=30)
            )
            sentinel_key = -(1 << 60)

            def _with_sentinel(df: DataFrame, ts_col: str) -> DataFrame:
                row = [
                    far if c == ts_col else (sentinel_key if c == key else None)
                    for c in df.columns
                ]
                return df.unionByName(
                    spark.createDataFrame([tuple(row)], schema=df.schema)
                )

            left = _with_sentinel(left, left_ts)
            right = _with_sentinel(right, right_ts)
        left.write.mode("overwrite").parquet(src_l)
        right.write.mode("overwrite").parquet(src_r)
        ls = spark.readStream.schema(left.schema).parquet(src_l)
        rs = spark.readStream.schema(right.schema).parquet(src_r)
        joined = stream_stream_interval_join(
            ls, rs, key, left_ts, right_ts, window=window,
            watermark=watermark, how=how,
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        out = spark.table(name)
        if sentinel_key is not None:
            out = out.filter(F.col(key) != F.lit(sentinel_key))
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(src_l, ignore_errors=True)
        shutil.rmtree(src_r, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
