"""Lakehouse maintenance: small-file compaction.

Streaming/incremental ingest (streaming/ingest.py) and per-trigger
appends accumulate many small files; parquet scan throughput collapses
when file count dwarfs file size (footer reads + task scheduling
dominate). Compaction rewrites a table's files to a target size —
the OPTIMIZE half of Delta's OPTIMIZE/ZORDER pair (the clustering
half is operators/zorder.py).

Uses the Hadoop FileSystem API (works on any Spark-supported FS) to
size the input, rewrites via ``repartition(target_count)``, then
swaps directories — readers see either the old or the new layout,
never a mix. Idempotent: re-running on a compacted table is a no-op
rewrite to the same file count.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> tuple[int, int]:
    """Rewrite ``path`` so files average ``target_file_bytes``.
    Returns (files_before, files_after)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)

    df = spark.read.format(fmt).load(path)
    n_before = len(df.inputFiles())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_after = max(1, math.ceil(total_bytes / target_file_bytes))

    tmp = path.rstrip("/") + ".__compact_tmp__"
    old = path.rstrip("/") + ".__compact_old__"
    df.repartition(n_after).write.mode("overwrite").format(fmt).save(tmp)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    fs.delete(jold, True)
    if not fs.rename(jpath, jold):
        raise IOError(f"compact: could not move {path} aside")
    if not fs.rename(jtmp, jpath):
        fs.rename(jold, jpath)  # roll back
        raise IOError(f"compact: could not swap in compacted {path}")
    fs.delete(jold, True)
    return n_before, n_after
