"""Structured Streaming → MiniDelta sink with exactly-once appends.

The reference's sink is a managed Delta table
(/root/reference/01_bronze/01_bronze_ingest.py:34); its streaming twin
in real deployments is ``writeStream.format("delta")``, whose
exactly-once guarantee comes from the transaction log's ``txn``
action: every micro-batch commit carries ``(appId, batchId)``, and a
replayed epoch (driver restart, checkpoint recovery, speculative
retry) is detected by comparing the incoming batch id against the
highest committed one and SKIPPED. This module is that contract over
:class:`~..sources.deltalog.MiniDeltaTable` via ``foreachBatch``.

Why the ledger lives in the table and not the stream checkpoint: the
stream checkpoint marks an epoch done only AFTER the sink returns, so
a crash between the sink's commit and the checkpoint write replays the
epoch — at-least-once. The ``txn`` stamp rides in the SAME atomic
log commit as the data files, turning the replay into a no-op:
at-least-once delivery × idempotent commit = exactly-once result.

Scale shape: the per-batch work is one ordinary distributed append
(the log adds O(files) metadata); the idempotence check is a
metadata-only snapshot replay, O(commits-since-checkpoint).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.deltalog import MiniDeltaTable

_run_seq = 0


def delta_append_batch(
    table: MiniDeltaTable, app_id: str
) -> Callable[[DataFrame, int], None]:
    """foreachBatch handler: append the micro-batch to ``table`` with
    a ``txn=(app_id, batch_id)`` stamp, skipping batch ids at or below
    the table's committed high-water mark (epoch replays after a
    checkpoint/commit race are no-ops, never duplicates)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        last = table.last_txn_version(app_id)
        if last is not None and batch_id <= last:
            return  # replayed epoch: already durably committed
        mode = "append" if table.exists() else "overwrite"
        table.write(batch_df, mode=mode, txn=(app_id, int(batch_id)))

    return handle


def run_stream_to_minidelta_bounded(
    spark: SparkSession,
    df: DataFrame,
    table: MiniDeltaTable,
    app_id: str,
) -> None:
    """Run a BOUNDED DataFrame through a real Structured Streaming
    query (parquet temp source → availableNow → foreachBatch) into the
    MiniDelta table — the batch-equivalence harness shape shared with
    streaming/dedup.run_stream_dedup_bounded."""
    global _run_seq
    _run_seq += 1
    src = tempfile.mkdtemp(prefix="deltasink_src_")
    ckpt = tempfile.mkdtemp(prefix="deltasink_ckpt_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        df.write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(delta_append_batch(table, app_id))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
