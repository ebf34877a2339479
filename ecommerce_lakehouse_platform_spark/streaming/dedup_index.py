"""Continuously-maintained near-dup index: streaming corpus dedup.

The batch operator ``neardup.minhash_lsh_pairs_incremental`` assumes a
stored band-bucket index; this module MAINTAINS that index as document
shards land on a stream:

    readStream → foreachBatch:
        batch shingle sets + MinHash band buckets        (map-side)
        → overwrite  <index>/sets/epoch=<id>/            (idempotent)
        → overwrite  <index>/buckets/epoch=<id>/
        batch buckets ⋈ full bucket index → candidates
        → exact-Jaccard verify (sets index)
        → overwrite  <index>/pairs/epoch=<id>/

Every near-dup pair is discovered exactly once — when its LATER
member lands — so the union of the per-epoch pair outputs equals the
one-shot ``minhash_lsh_pairs`` over the full corpus (asserted
set-equal in tests/test_dedup_index.py). History is never re-paired
with itself: each epoch's join cost is the batch's buckets against
the stored index, the continuous-ingest cost model at 100 TB.

Exactly-once without Delta: a replayed micro-batch rewrites the SAME
epoch directories with ``mode("overwrite")`` — sets/buckets land
identically, and the pair join reads the bucket glob that already
includes the epoch's own (overwritten) rows, so replay output is
byte-identical rather than double-counted. At scale the bucket index
is additionally partitioned by (band, bucket) so a shard's join
prunes to the buckets it actually touches; the fixture-size tests
keep the flat layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.neardup import (
    _minhash_band_buckets,
    _shingle_sets,
    _verify_exact_jaccard,
)

__all__ = ["maintain_dedup_index", "read_pairs"]


def _read_epochs(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.isdir(path):
        return None
    subdirs = [
        f"{path}/{d}" for d in sorted(os.listdir(path)) if d.startswith("epoch=")
    ]
    if not subdirs:
        return None
    return spark.read.parquet(*subdirs)


def maintain_dedup_index(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    available_now: bool = False,
):
    """Start the index-maintenance stream; returns the StreamingQuery.

    ``doc_stream`` must carry (``id_col``, ``text_col``); document ids
    are globally unique across the stream's lifetime.
    """

    def fold_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        sets_df = _shingle_sets(batch_df, id_col, text_col, n)
        buckets = _minhash_band_buckets(sets_df, num_perm, bands)
        try:
            sets_df.write.mode("overwrite").parquet(
                f"{index_path}/sets/epoch={epoch_id}"
            )
            buckets.write.mode("overwrite").parquet(
                f"{index_path}/buckets/epoch={epoch_id}"
            )
            # the glob includes this epoch's own rows → batch×batch
            # pairs surface here too, exactly once
            index_buckets = _read_epochs(spark, f"{index_path}/buckets")
            index_sets = _read_epochs(spark, f"{index_path}/sets")
            qb = buckets.select(
                F.col("doc_id").alias("doc_q"), "band", "bucket"
            )
            ib = index_buckets.select(
                F.col("doc_id").alias("doc_i"), "band", "bucket"
            )
            candidates = (
                qb.join(ib, ["band", "bucket"])
                .filter(F.col("doc_q") != F.col("doc_i"))
                .select(
                    F.least("doc_q", "doc_i").alias("doc_a"),
                    F.greatest("doc_q", "doc_i").alias("doc_b"),
                )
                .distinct()
            )
            # every candidate touches the batch by construction (the
            # query side IS the batch), so prior-epoch-internal pairs
            # can never re-emit
            pairs = _verify_exact_jaccard(candidates, index_sets, threshold)
            pairs.write.mode("overwrite").parquet(
                f"{index_path}/pairs/epoch={epoch_id}"
            )
        finally:
            sets_df.unpersist()

    writer = doc_stream.writeStream.foreachBatch(fold_epoch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_pairs(spark: SparkSession, index_path: str) -> DataFrame:
    """All near-dup pairs discovered so far (union of epoch outputs)."""
    pairs = _read_epochs(spark, f"{index_path}/pairs")
    if pairs is None:
        return spark.createDataFrame(
            [], "doc_a long, doc_b long, jaccard double"
        )
    return pairs.distinct()
