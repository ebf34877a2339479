"""Continuously-maintained gold rollups: foreachBatch + mergeable
partial state.

The reference rebuilds every gold table from the full silver history
on each run (mode("overwrite"),
/root/reference/03_gold/03_gold_aggregate.py:24-31). The streaming
twin keeps the rollup CURRENT as events land, touching only each
micro-batch's rows:

    readStream → foreachBatch:
        partial_rollup(batch)                # additive DECIMAL state
        → overwrite  <state>/epoch=<id>/     # idempotent per epoch
    read side: merge_rollups(all epochs)     # fold at query time
    maintenance: compact_rollup              # fold epochs on disk

Exactly-once without Delta: Structured Streaming replays a failed
micro-batch with the SAME epoch id, and the epoch write targets its
own directory with mode("overwrite") — a replay overwrites identical
state instead of double-counting. The read-side fold is associative/
commutative (decimal sums, counts), so epoch boundaries and merge
order cannot change the result; ``merged == one-shot rollup`` is
asserted bit-for-bit in tests/test_streaming_gold.py.

At scale each epoch directory is ~|grain| rows (the rollup, not the
raw data), the read-side fold shuffles only rollup rows, and
compaction keeps the epoch count bounded — the same pattern as
operators/rollup.py's batch incremental refresh, driven by a stream.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from ..operators.rollup import merge_rollups, partial_rollup

__all__ = ["maintain_rollup_stream", "read_rollup", "compact_rollup"]


def maintain_rollup_stream(
    stream: DataFrame,
    keys: Sequence[str],
    sum_cols: Mapping[str, Column],
    state_path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """Start a streaming query that maintains an additive rollup of
    ``stream`` under ``state_path`` (one partial-state parquet dir per
    epoch). Returns the StreamingQuery."""

    def fold_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        partial = partial_rollup(batch_df, list(keys), sum_cols)
        # per-epoch directory + overwrite = idempotent under replay
        partial.write.mode("overwrite").parquet(
            f"{state_path}/epoch={epoch_id}"
        )

    writer = stream.writeStream.foreachBatch(fold_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rollup(
    spark: SparkSession, state_path: str, keys: Sequence[str]
) -> DataFrame:
    """Current rollup = fold of every epoch's partial state."""
    state = spark.read.option("basePath", state_path).parquet(
        f"{state_path}/epoch=*"
    ).drop("epoch")
    return merge_rollups([state], list(keys))


def compact_rollup(
    spark: SparkSession, state_path: str, keys: Sequence[str]
) -> None:
    """Fold all epoch directories into a single epoch=-1 state and
    remove the originals — bounds the read-side fan-in. Runs as a
    maintenance job between stream restarts (same swap discipline as
    sources/maintenance.compact_table)."""
    import shutil
    import tempfile
    from pathlib import Path

    merged = read_rollup(spark, state_path, keys)
    tmp = tempfile.mkdtemp(prefix="rollup_compact_")
    merged.write.mode("overwrite").parquet(f"{tmp}/epoch=-1")
    for child in Path(state_path).glob("epoch=*"):
        shutil.rmtree(child)
    shutil.move(f"{tmp}/epoch=-1", f"{state_path}/epoch=-1")
    shutil.rmtree(tmp, ignore_errors=True)
