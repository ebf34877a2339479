"""Continuous ingest: streaming bronze→silver equals the batch
pipeline on the same files, and compaction collapses update history
to keep-latest."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.functions.cleaning import clean_id
from ecommerce_lakehouse_platform_spark.streaming.ingest import (
    append_silver_stream,
    compact_keep_latest,
    stream_bronze_csv,
)

SCHEMA = "customer_id STRING, name STRING, age INT"


def _silver(df):
    return df.select(
        clean_id("customer_id").alias("customer_id"),
        F.trim("name").alias("name"),
        F.col("age").cast("int").alias("age"),
        "_ingest_ts",
        "_source_file",
    ).filter(F.col("customer_id").isNotNull())


def test_stream_ingest_then_compact_keep_latest(spark):
    land = tempfile.mkdtemp(prefix="land_")
    out = tempfile.mkdtemp(prefix="silver_out_")
    ckpt = tempfile.mkdtemp(prefix="ingest_ckpt_")
    try:
        # drop 1: two customers (one with a float-string id); drop 2:
        # an update for customer 7 plus a garbage-id row
        with open(f"{land}/batch1.csv", "w") as f:
            f.write("customer_id,name,age\n7.0,  Old Name ,30\n8,Bob,41\n")
        with open(f"{land}/batch2.csv", "w") as f:
            f.write("customer_id,name,age\n7, New Name ,31\nxyz,Ghost,99\n")

        stream = stream_bronze_csv(
            spark, land, SCHEMA, source_tag="customers", max_files_per_trigger=1
        )
        q = append_silver_stream(
            stream,
            _silver,
            out_path=out,
            checkpoint=ckpt,
            available_now=True,
        )
        q.awaitTermination(120)

        appended = spark.read.parquet(out)
        # garbage id dropped by the silver filter; history preserved
        assert appended.count() == 3
        files = {r._source_file for r in appended.collect()}
        assert files == {"batch1.csv", "batch2.csv"}

        # restartability: a new stream over the same checkpoint sees
        # nothing new and appends nothing (exactly-once per epoch)
        q2 = append_silver_stream(
            stream, _silver, out_path=out, checkpoint=ckpt, available_now=True
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(out).count() == 3

        # compaction collapses customer 7's history to the newest row
        n = compact_keep_latest(
            spark, out, ["customer_id"], ["_ingest_ts", "_source_file"]
        )
        assert n == 2
        rows = {r.customer_id: r for r in spark.read.parquet(out).collect()}
        assert set(rows) == {"7", "8"}
        assert rows["7"].name == "New Name"
        assert rows["7"].age == 31
    finally:
        for d in (land, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_ingest_into_minidelta_exactly_once(spark):
    """The reference's managed-Delta streaming shape end-to-end:
    streaming bronze CSV → the SAME silver transform → foreachBatch
    append into the MiniDelta table with txn stamps. The table equals
    the batch silver relation, a checkpoint restart appends nothing,
    and a forced epoch replay is a no-op (exactly-once)."""
    import os

    from ecommerce_lakehouse_platform_spark.sources.deltalog import (
        MiniDeltaTable,
    )
    from ecommerce_lakehouse_platform_spark.streaming.delta_sink import (
        delta_append_batch,
    )

    land = tempfile.mkdtemp(prefix="land_")
    ckpt = tempfile.mkdtemp(prefix="ingest_ckpt_")
    tbl_dir = tempfile.mkdtemp(prefix="silver_tbl_")
    table = MiniDeltaTable(spark, os.path.join(tbl_dir, "customers"))
    try:
        with open(f"{land}/batch1.csv", "w") as f:
            f.write("customer_id,name,age\n7.0,  Old Name ,30\n8,Bob,41\n")
        with open(f"{land}/batch2.csv", "w") as f:
            f.write("customer_id,name,age\n9, Carol ,25\nxyz,Ghost,99\n")

        def run():
            stream = stream_bronze_csv(
                spark, land, SCHEMA, source_tag="customers"
            )
            # drop the per-run ingest timestamp: silver content must be
            # a pure function of the files for the equality below
            out = _silver(stream).drop("_ingest_ts")
            q = (
                out.writeStream.foreachBatch(
                    delta_append_batch(table, "silver-ingest")
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        got = {(r.customer_id, r.name, r.age, r._source_file)
               for r in table.read().collect()}
        assert got == {
            ("7", "Old Name", 30, "batch1.csv"),
            ("8", "Bob", 41, "batch1.csv"),
            ("9", "Carol", 25, "batch2.csv"),
        }
        last = table.last_txn_version("silver-ingest")
        assert last is not None
        n_versions = len(table.versions())

        # restart over the same checkpoint: no new epochs, no new rows
        run()
        assert table.read().count() == 3
        assert len(table.versions()) == n_versions

        # forced replay of the last committed epoch: idempotent skip
        replay = table.read().limit(1)
        delta_append_batch(table, "silver-ingest")(replay, last)
        assert table.read().count() == 3
        assert len(table.versions()) == n_versions
    finally:
        for d in (land, ckpt, tbl_dir):
            shutil.rmtree(d, ignore_errors=True)
