"""Streaming near-dup index maintenance (streaming/dedup_index.py):
the union of per-epoch pair discoveries must equal the one-shot batch
run over the full corpus — each pair found exactly once, when its
later member lands."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.neardup import (
    minhash_lsh_pairs,
)
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table
from ecommerce_lakehouse_platform_spark.streaming.dedup_index import (
    maintain_dedup_index,
    read_pairs,
)


def test_streamed_index_equals_one_shot_batch(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    src = tempfile.mkdtemp(prefix="dedup_idx_src_")
    index = tempfile.mkdtemp(prefix="dedup_idx_state_")
    ckpt = tempfile.mkdtemp(prefix="dedup_idx_ckpt_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # three shards land as three files → maxFilesPerTrigger=1
        # processes them as three ordered micro-batches
        for i, bound in enumerate([(0, 170), (170, 340), (340, 10**9)]):
            docs.filter(
                (F.col("doc_id") >= bound[0]) & (F.col("doc_id") < bound[1])
            ).coalesce(1).write.mode("overwrite").parquet(f"{src}/shard={i}")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/shard=*")
        )
        q = maintain_dedup_index(
            stream, index, ckpt, threshold=0.5, available_now=True
        )
        q.awaitTermination(300)

        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in read_pairs(spark, index).collect()
        }
        want = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
        }
        assert want, "fixture should contain near-dup pairs"
        assert got == want

        # at least one pair must span shards (otherwise the
        # batch-vs-index join path was never really exercised)
        assert any(
            (a < 170) != (b < 170) or (a < 340) != (b < 340)
            for a, b in got
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        for d in (src, index, ckpt):
            shutil.rmtree(d, ignore_errors=True)
