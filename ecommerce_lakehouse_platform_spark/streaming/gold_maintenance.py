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


_COMMIT_FILE = "COMPACTED"


def _commit_info(state_path: str) -> dict:
    """Compaction manifest: which generation directory is live and the
    highest epoch id folded into it. Absent = nothing compacted."""
    import json
    from pathlib import Path

    p = Path(state_path) / _COMMIT_FILE
    if p.exists():
        return json.loads(p.read_text())
    return {"gen": -1, "through_epoch": -1}


def _live_state(state_path: str) -> tuple[str | None, list[str]]:
    """(compacted base dir or None, epoch dirs newer than the base).

    Epoch ids from Structured Streaming are monotone, so "folded"
    is simply ``id <= through_epoch`` — leftover folded directories
    from a crashed cleanup are ignored, never double-counted."""
    from pathlib import Path

    info = _commit_info(state_path)
    dirs = [
        str(child)
        for child in sorted(Path(state_path).glob("epoch=*"))
        if int(child.name.split("=", 1)[1]) > info["through_epoch"]
    ]
    base = (
        f"{state_path}/compact_gen={info['gen']}" if info["gen"] >= 0 else None
    )
    return base, dirs


def read_rollup(
    spark: SparkSession, state_path: str, keys: Sequence[str]
) -> DataFrame:
    """Current rollup = fold of the compacted base (if any) plus every
    not-yet-folded epoch's partial state."""
    base, dirs = _live_state(state_path)
    frames = [spark.read.parquet(p) for p in ([base] if base else []) + dirs]
    return merge_rollups(frames, list(keys))


def compact_rollup(
    spark: SparkSession, state_path: str, keys: Sequence[str]
) -> None:
    """Fold the live state into one new generation directory — bounds
    the read-side fan-in. Runs as a maintenance job between stream
    restarts.

    Crash-safe commit discipline (the state is ADDITIVE, so a merged
    copy and its inputs must never both be visible — a partial delete
    undercounts, a leftover copy double-counts):

    1. write the merged state to a NEW ``compact_gen=<g+1>`` dir —
       readers still resolve the old manifest, nothing changes;
    2. commit by atomically replacing the ``COMPACTED`` manifest
       (``os.replace``) to point at the new generation and record the
       highest folded epoch id;
    3. only then delete the folded epoch dirs and the old generation.

    A crash before (2) leaves an orphan generation dir that the next
    compaction overwrites; a crash after (2) leaves folded dirs that
    readers ignore via the ``through_epoch`` watermark. At no point
    does a reader see a double-counted or partial state."""
    import json
    import os
    import shutil
    from pathlib import Path

    info = _commit_info(state_path)
    base, dirs = _live_state(state_path)
    if not dirs:
        return
    through = max(int(Path(d).name.split("=", 1)[1]) for d in dirs)
    gen = info["gen"] + 1
    merged = merge_rollups(
        [spark.read.parquet(p) for p in ([base] if base else []) + dirs],
        list(keys),
    )
    merged.write.mode("overwrite").parquet(f"{state_path}/compact_gen={gen}")
    tmp = Path(state_path) / (_COMMIT_FILE + ".tmp")
    tmp.write_text(json.dumps({"gen": gen, "through_epoch": through}))
    os.replace(tmp, Path(state_path) / _COMMIT_FILE)  # commit point
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
    if info["gen"] >= 0:
        shutil.rmtree(
            Path(state_path) / f"compact_gen={info['gen']}", ignore_errors=True
        )
