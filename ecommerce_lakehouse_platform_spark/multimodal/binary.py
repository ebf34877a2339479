"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested: schema contracts,
partition-preserving mapInPandas with bounded batch sizes, metadata
extraction, and content hashing all run; only the actual media
*decode* (image/audio codecs) is stubbed because the codec libraries
are not in this environment — ``decode_image_batch`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic byte-statistics "decode" with the same output schema and
batch shape a real decoder would have.

Pattern notes for 100 TB media lakes:
- keep payloads in their own column so column pruning skips them for
  metadata-only queries;
- mapInPandas streams Arrow batches — per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition
  size;
- pure-SQL features (length, hash) stay out of Python entirely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Input contract: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
    ]
)

# Output contract of the decode stage.
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: treat UTF-8 bytes of a text column as an
    opaque media payload so the binary pipeline is exercisable with
    the shipped test data."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def binary_metadata(df: DataFrame) -> DataFrame:
    """Pure-SQL metadata over the payload: length + sha256 — no Python,
    no decode, prunes to the payload column only."""
    return df.select(
        "media_id",
        "media_type",
        F.length(F.col("payload")).cast("long").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("content_sha256"),
    )


def _fake_decode(payload: bytes, n_bins: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-histogram
    densities (same shape/type a tiny image/audio embedding head would
    emit)."""
    if not payload:
        return [0.0] * n_bins
    counts = [0] * n_bins
    for b in payload:
        counts[b % n_bins] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def decode_media(
    df: DataFrame, fake: bool = False, batch_note: str = "arrow"
) -> DataFrame:
    """Decode/feature-extract payloads via mapInPandas.

    ``fake=False`` raises NotImplementedError (codec libraries not
    available here); ``fake=True`` runs the deterministic stand-in
    through the identical Spark plumbing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio codec libraries; "
                    "run with fake=True for the deterministic stand-in"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(_fake_decode),
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


# Output contract of the resize stage: payload-in, payload-out with
# target dimensions stamped (real pipelines chain this before decode).
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Resize image payloads to ``width × height`` via mapInPandas.

    ``fake=True`` substitutes a deterministic byte-resampler (truncate
    or cycle-pad the payload to width*height bytes — the size contract
    a real raster resize has) through the same Arrow plumbing;
    ``fake=False`` raises NotImplementedError (no codec libraries in
    this environment).
    """
    target = width * height

    def _fake_resize(payload: bytes) -> bytes:
        if not payload:
            return bytes(target)
        reps = -(-target // len(payload))  # ceil
        return (payload * reps)[:target]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires codec libraries; "
                    "run with fake=True for the deterministic stand-in"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(_fake_resize),
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


# Output contract of perceptual hashing: one 48-bit hash per media row.
PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("phash", LongType()),
    ]
)


def media_phash(df: DataFrame, fake: bool = False) -> DataFrame:
    """Perceptual hash per media payload via mapInPandas — the
    image-dedup fingerprint stage (blockhash/pHash family: quantize
    decoded content into coarse statistics, one bit per statistic-vs-
    mean comparison, so visually identical media collide and minor
    re-encodes land at small Hamming distance).

    A real implementation decodes the raster and thresholds DCT/block
    luminance against the median — codec-bound, so ``fake=False``
    raises NotImplementedError here. ``fake=True`` runs the
    deterministic stand-in through identical Arrow plumbing: 48
    byte-value histogram bins (value mod 48), bit j set iff
    ``48·count_j > total_bytes`` — the same statistic-vs-mean shape,
    with EXACT integer comparisons only (no float thresholds), so the
    hash is bit-reproducible in any engine (the DuckDB oracle replays
    it in the hex domain). 48 bits keeps every hash a positive BIGINT
    in both engines. Empty payloads hash to 0.

    Downstream is pure JVM relational work: exact dedup is one
    groupBy(phash); Hamming near-dup reuses the SimHash banding idiom
    (operators/neardup.simhash_pairs) on this column unchanged.
    """
    n_bits = 48

    def _fake_phash(payload: bytes) -> int:
        if not payload:
            return 0
        counts = [0] * n_bits
        for b in payload:
            counts[b % n_bits] += 1
        total = len(payload)
        h = 0
        for j in range(n_bits):
            if n_bits * counts[j] > total:
                h |= 1 << j
        return h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real perceptual hashing requires image codec libraries; "
                    "run with fake=True for the deterministic stand-in"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "phash": pdf["payload"].map(_fake_phash).astype("int64"),
                }
            )

    return df.mapInPandas(batches, schema=PHASH_SCHEMA)


# Output contract of frame sampling: 1 video row → N frame rows.
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 4, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Sample frames from video payloads: one input row fans out to up
    to ``max_frames`` frame rows (1→N expansion inside mapInPandas —
    the batch shape a real ffmpeg-style sampler has; output row count
    is decoupled from input row count).

    The deterministic stand-in treats the payload as a byte stream of
    fixed-size "frames" (16 bytes) and takes every ``every_n``-th one.
    """
    frame_bytes = 16

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires video codec libraries; "
                    "run with fake=True for the deterministic stand-in"
                )
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload) // frame_bytes
                for k, f in enumerate(range(0, n, every_n)):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(f)
                    frames.append(
                        bytes(payload[f * frame_bytes : (f + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
