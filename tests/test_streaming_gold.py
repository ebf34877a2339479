"""Streaming gold maintenance: the foreachBatch-maintained rollup
must equal the one-shot batch rollup bit-for-bit (DECIMAL additive
state), survive epoch replays without double-counting, and compact
to a single equivalent state."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.rollup import partial_rollup
from ecommerce_lakehouse_platform_spark.streaming.gold_maintenance import (
    compact_rollup,
    maintain_rollup_stream,
    read_rollup,
)

from .conftest import SF_SMOKE

KEYS = ["event_type"]


def _sums():
    return {"total_value": F.col("value")}


def _events_batch(spark):
    # the nanos-ts events fixture needs the tuned reader; value+type
    # are the only columns the rollup touches
    from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

    return load_table(spark, SF_SMOKE, "events").select("event_type", "value")


def _canon(df):
    return sorted(
        (r["event_type"], r["n_rows"], str(r["total_value"])) for r in df.collect()
    )


def test_streamed_rollup_equals_batch_and_replay_is_idempotent(spark):
    land = tempfile.mkdtemp(prefix="gold_land_")
    state = tempfile.mkdtemp(prefix="gold_state_")
    ckpt = tempfile.mkdtemp(prefix="gold_ckpt_")
    try:
        ev = _events_batch(spark)
        # land the events as several files so availableNow +
        # maxFilesPerTrigger yields multiple micro-batches (epochs)
        ev.repartition(3).write.mode("overwrite").parquet(land)

        stream = (
            spark.readStream.schema("event_type STRING, value DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(land)
        )
        q = maintain_rollup_stream(
            stream, KEYS, _sums(), state_path=state, checkpoint=ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

        epochs = list(Path(state).glob("epoch=*"))
        assert len(epochs) >= 2, "expected multiple micro-batches"

        streamed = read_rollup(spark, state, KEYS)
        batch = partial_rollup(spark.read.parquet(land), KEYS, _sums())
        assert _canon(streamed) == _canon(batch)

        # replay: re-running an epoch's fold with the same id must
        # overwrite, not double-count (what Structured Streaming does
        # after a mid-batch failure)
        first_epoch = sorted(int(p.name.split("=")[1]) for p in epochs)[0]
        replay_df = spark.read.parquet(land).limit(100)
        partial_rollup(replay_df, KEYS, _sums()).write.mode("overwrite").parquet(
            f"{state}/epoch={first_epoch}"
        )
        once = _canon(read_rollup(spark, state, KEYS))
        partial_rollup(
            spark.read.parquet(land).limit(100), KEYS, _sums()
        ).write.mode("overwrite").parquet(f"{state}/epoch={first_epoch}")
        assert _canon(read_rollup(spark, state, KEYS)) == once

        # restart over the same checkpoint: no new epochs, same result
        q2 = maintain_rollup_stream(
            stream, KEYS, _sums(), state_path=state, checkpoint=ckpt,
            available_now=True,
        )
        q2.awaitTermination(120)
        assert _canon(read_rollup(spark, state, KEYS)) == once
    finally:
        for d in (land, state, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_compact_rollup_preserves_state(spark):
    land = tempfile.mkdtemp(prefix="goldc_land_")
    state = tempfile.mkdtemp(prefix="goldc_state_")
    ckpt = tempfile.mkdtemp(prefix="goldc_ckpt_")
    try:
        _events_batch(spark).repartition(3).write.mode("overwrite").parquet(land)
        stream = (
            spark.readStream.schema("event_type STRING, value DOUBLE")
            .option("maxFilesPerTrigger", "1")
            .parquet(land)
        )
        q = maintain_rollup_stream(
            stream, KEYS, _sums(), state_path=state, checkpoint=ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

        before = _canon(read_rollup(spark, state, KEYS))
        compact_rollup(spark, state, KEYS)
        assert list(Path(state).glob("epoch=*")) == []
        assert len(list(Path(state).glob("compact_gen=*"))) == 1
        assert _canon(read_rollup(spark, state, KEYS)) == before

        # crash-safety: a folded epoch dir left behind by a crashed
        # cleanup is ignored (through_epoch watermark), never
        # double-counted — and a second compaction folds new epochs
        # on top of the committed generation.
        stale = Path(state) / "epoch=0"
        stale.mkdir()
        (stale / "_SUCCESS").touch()
        assert _canon(read_rollup(spark, state, KEYS)) == before
        compact_rollup(spark, state, KEYS)  # no live epochs → no-op
        assert _canon(read_rollup(spark, state, KEYS)) == before
    finally:
        for d in (land, state, ckpt):
            shutil.rmtree(d, ignore_errors=True)
