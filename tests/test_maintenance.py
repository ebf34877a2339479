"""Small-file compaction (sources/maintenance.py): file count drops
to the size-derived target, data survives byte-for-byte, and the
operation is idempotent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.sources.catalog import load_table
from ecommerce_lakehouse_platform_spark.sources.maintenance import compact_table

from .conftest import SF_SMOKE


def test_compaction_reduces_files_and_preserves_data(spark):
    src = tempfile.mkdtemp(prefix="compact_")
    path = os.path.join(src, "events")
    try:
        ev = load_table(spark, SF_SMOKE, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        ev.repartition(32).write.mode("overwrite").parquet(path)
        before_sum = (
            spark.read.parquet(path)
            .agg(F.sum(F.col("value").cast("decimal(30,6)")).alias("s"))
            .collect()[0]["s"]
        )
        n_before, n_after = compact_table(
            spark, path, target_file_bytes=8 << 20
        )
        assert n_before == 32
        assert n_after < n_before
        compacted = spark.read.parquet(path)
        assert len(compacted.inputFiles()) == n_after
        assert compacted.count() == ev.count()
        after_sum = compacted.agg(
            F.sum(F.col("value").cast("decimal(30,6)")).alias("s")
        ).collect()[0]["s"]
        assert after_sum == before_sum
        # idempotent: second run keeps the same file count
        n2_before, n2_after = compact_table(
            spark, path, target_file_bytes=8 << 20
        )
        assert (n2_before, n2_after) == (n_after, n_after)
    finally:
        shutil.rmtree(src, ignore_errors=True)
