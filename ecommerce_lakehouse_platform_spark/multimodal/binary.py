"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested: schema contracts,
partition-preserving mapInPandas with bounded batch sizes, metadata
extraction, and content hashing all run. Codec coverage is split by
what this environment can honestly implement:

* REAL codecs for the trivially-public raster formats — netpbm P5/P6
  (grayscale/RGB, binary raster) and uncompressed 24-bit BI_RGB BMP —
  implemented from their specs with numpy: decode → exact
  nearest-neighbor resize (integer floor index map, so the result is
  bit-reproducible in any engine) → canonical re-encode.
  ``resize_media(fake=False)`` runs this path end-to-end on genuine
  pixels.
* JPEG/PNG/audio/video stay stubbed (their codec libraries are not in
  this environment): ``decode_media``/``media_phash``/``sample_frames``
  raise NotImplementedError unless ``fake=True``, which substitutes a
  deterministic byte-statistics stand-in with the same output schema
  and batch shape a real decoder would have.

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


def attach_pgm_payload(
    df: DataFrame, width: int = 12, height: int = 8
) -> DataFrame:
    """Fixture adapter for the REAL codec path: build a genuine binary
    PGM (netpbm P5) image per document — canonical header + width×
    height pixel bytes derived from an md5 chain of the doc id (hex is
    ASCII, so the construction is byte-exact and replayable in any
    engine's SQL). Entirely JVM-side: concat/unhex/md5, no Python."""
    n_bytes = width * height
    n_blocks = -(-n_bytes // 16)  # each md5 block yields 16 bytes
    pix_hex = F.concat(
        *[
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(f":pgm{i}"))
            )
            for i in range(n_blocks)
        ]
    )
    header = f"P5\n{width} {height}\n255\n".encode()
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.concat(
            F.lit(header), F.unhex(F.substring(pix_hex, 1, n_bytes * 2))
        ).alias("payload"),
    )


def attach_wave_payload(
    df: DataFrame, n_samples: int = 256, sample_rate: int = 16000
) -> DataFrame:
    """Fixture adapter for the REAL audio path: build a genuine
    RIFF/WAVE mono 16-bit PCM payload per document — the canonical
    header :func:`encode_wav` writes (constant for a fixed sample
    count) followed by ``n_samples`` little-endian int16 samples whose
    bytes come from an md5 chain of the doc id. Hex is ASCII and md5
    is engine-agnostic, so the construction is byte-exact and
    replayable in any SQL engine; entirely JVM-side (concat/unhex/md5,
    no Python)."""
    import struct

    n_bytes = n_samples * 2
    n_blocks = -(-n_bytes // 16)  # each md5 block yields 16 bytes
    pcm_hex = F.concat(
        *[
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(f":wav{i}"))
            )
            for i in range(n_blocks)
        ]
    )
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
    )
    header = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + n_bytes, b"WAVE")
        + fmt
        + struct.pack("<4sI", b"data", n_bytes)
    )
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("media_type"),
        F.concat(
            F.lit(header), F.unhex(F.substring(pcm_hex, 1, n_bytes * 2))
        ).alias("payload"),
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


def _real_decode(payload: bytes, n_bins: int = 8) -> list[float]:
    """REAL decode + feature head for the supported formats: image
    rasters (netpbm/BMP, below) emit pixel-value histogram densities
    (bin = value // 32); WAVE audio emits absolute-amplitude
    histogram densities — the same shape/type a tiny embedding head
    produces, computed from genuine content. Unknown formats raise
    (honest gap)."""
    if payload[:4] == b"RIFF":
        return _wav_features(payload, n_bins)
    arr = decode_raster(payload)
    flat = arr.reshape(-1)
    counts = [0] * n_bins
    width = 256 // n_bins
    for v in flat.tolist():
        counts[min(int(v) // width, n_bins - 1)] += 1
    total = float(flat.size)
    return [c / total for c in counts]


def decode_media(
    df: DataFrame, fake: bool = False, batch_note: str = "arrow"
) -> DataFrame:
    """Decode/feature-extract payloads via mapInPandas.

    ``fake=False`` runs the REAL codec path on netpbm P5/P6 and
    uncompressed 24-bit BMP payloads (pixel-value histogram features
    from genuine rasters); other formats raise NotImplementedError.
    ``fake=True`` runs the deterministic byte-statistics stand-in
    through the identical Spark plumbing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoder = _fake_decode if fake else (
                lambda p: _real_decode(bytes(p))
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "feature": pdf["payload"].map(decoder),
                }
            )

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Real raster codecs: netpbm P5/P6 and uncompressed 24-bit BMP
# ---------------------------------------------------------------------------
# Public formats simple enough to implement honestly from their specs
# with numpy (already a dependency): netpbm (http://netpbm.sourceforge
# .net/doc/pgm.html, /ppm.html) and the Windows BITMAPINFOHEADER
# layout. These give resize_media a genuine decode→resample→re-encode
# path; everything stays exact-integer so results are engine- and
# partitioning-independent.


def encode_netpbm(arr) -> bytes:
    """Canonical netpbm encode: grayscale (h, w) → P5, RGB (h, w, 3)
    → P6, maxval 255, header ``P{5|6}\\n{w} {h}\\n255\\n`` + raster."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported raster shape {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_netpbm(payload: bytes):
    """Decode binary netpbm (P5 grayscale / P6 RGB, maxval ≤ 255, with
    ``#`` comments allowed between header tokens per the spec) into a
    numpy array of shape (h, w) or (h, w, 3)."""
    import numpy as np

    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    magic = payload[:2]
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("two-byte netpbm maxval not supported")
    channels = 1 if magic == b"P5" else 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels,
                           offset=pos)
    return raster.reshape((h, w) if channels == 1 else (h, w, channels))


def encode_bmp(arr) -> bytes:
    """Canonical uncompressed 24-bit BI_RGB BMP encode: (h, w, 3) RGB
    array → BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up BGR rows
    padded to 4 bytes."""
    import struct

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"BMP encode needs (h, w, 3) RGB, got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    row_len = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    bgr = arr[:, :, ::-1]  # RGB → BGR
    pad = b"\x00" * (row_len - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        raster += bgr[y].tobytes() + pad
    size = 14 + 40 + len(raster)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster),
                       2835, 2835, 0, 0)
    return header + info + bytes(raster)


def decode_bmp(payload: bytes):
    """Decode uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER,
    positive height = bottom-up) into an (h, w, 3) RGB numpy array."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB supported")
    bottom_up = h > 0
    h = abs(h)
    row_len = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_len, offset=offset
    ).reshape(h, row_len)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def resize_nearest(arr, width: int, height: int):
    """Exact nearest-neighbor resample: destination pixel (x, y) takes
    source pixel (⌊x·W/width⌋, ⌊y·H/height⌋) — pure integer floor
    index math, so any engine replaying the map gets identical
    bytes."""
    import numpy as np

    src_h, src_w = arr.shape[0], arr.shape[1]
    ys = (np.arange(height) * src_h) // height
    xs = (np.arange(width) * src_w) // width
    return arr[np.ix_(ys, xs)]


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Canonical RIFF/WAVE encode: mono 16-bit PCM — header (fmt
    chunk) + little-endian samples. The one audio format trivial
    enough to implement honestly from its public spec."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(payload: bytes):
    """Decode RIFF/WAVE mono 16-bit PCM into (sample_rate, int16
    array), walking the chunk list per the spec (extra chunks like
    LIST/INFO are skipped); anything but PCM16 mono raises."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    "only mono 16-bit PCM WAVE supported "
                    f"(fmt={audio_fmt}, ch={channels}, bits={bits})"
                )
            sample_rate = rate
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAVE payload missing fmt or data chunk")
    return sample_rate, np.frombuffer(data, dtype="<i2")


def _wav_features(payload: bytes, n_bins: int = 8) -> list[float]:
    """Feature head for audio: absolute-amplitude histogram densities
    (bin = |sample| // 4096, 8 bins over the int16 range) — the same
    output shape as the image head, computed from genuine samples."""
    _rate, samples = decode_wav(payload)
    if samples.size == 0:
        return [0.0] * n_bins
    counts = [0] * n_bins
    for v in samples.tolist():
        counts[min(abs(int(v)) // 4096, n_bins - 1)] += 1
    total = float(samples.size)
    return [c / total for c in counts]


def decode_raster(payload: bytes):
    """Dispatch a payload to its real decoder by magic bytes: netpbm
    P5/P6 or uncompressed 24-bit BMP → numpy array; anything else
    raises NotImplementedError (JPEG/PNG/audio/video codecs are not in
    this environment)."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "no codec for this payload format in this environment (real "
        "support: netpbm P5/P6 and uncompressed 24-bit BMP); run with "
        "fake=True for the deterministic stand-in"
    )


def luminance(arr):
    """Integer luminance plane: grayscale rasters pass through; RGB
    collapses to exact (r+g+b)//3 — no float weights, so the plane
    (and every hash built on it) is bit-reproducible."""
    import numpy as np

    if arr.ndim == 2:
        return arr
    return (
        arr[:, :, 0].astype(np.int64)
        + arr[:, :, 1].astype(np.int64)
        + arr[:, :, 2].astype(np.int64)
    ) // 3


def reencode_resized(payload: bytes, width: int, height: int) -> bytes:
    """The real decode → nearest-neighbor resize → canonical re-encode
    path, dispatched on the payload's magic bytes. Raises
    NotImplementedError for formats whose codecs this environment
    cannot honestly provide (JPEG/PNG/...)."""
    if payload[:2] in (b"P5", b"P6"):
        return encode_netpbm(
            resize_nearest(decode_netpbm(payload), width, height)
        )
    if payload[:2] == b"BM":
        return encode_bmp(
            resize_nearest(decode_bmp(payload), width, height)
        )
    raise NotImplementedError(
        "no codec for this payload format in this environment (real "
        "support: netpbm P5/P6 and uncompressed 24-bit BMP); run with "
        "fake=True for the deterministic stand-in"
    )


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

    ``fake=False`` runs the REAL codec path (netpbm P5/P6 and
    uncompressed 24-bit BMP: decode, exact nearest-neighbor resample,
    canonical re-encode — genuine pixels, bit-reproducible); payloads
    in any other format raise NotImplementedError. ``fake=True``
    substitutes a deterministic byte-resampler (truncate or cycle-pad
    the payload to width*height bytes — the size contract a real
    raster resize has) through the same Arrow plumbing.
    """
    target = width * height

    def _fake_resize(payload: bytes) -> bytes:
        if not payload:
            return bytes(target)
        reps = -(-target // len(payload))  # ceil
        return (payload * reps)[:target]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resizer = (
                _fake_resize
                if fake
                else lambda p: reencode_resized(bytes(p), width, height)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(resizer),
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

    ``fake=False`` runs a REAL blockhash over the supported raster
    formats (netpbm P5/P6 + 24-bit BMP): decode, exact integer
    luminance, nearest-resample to an 8×6 thumbnail, bit j set iff
    ``48·cell_j > Σcells`` — the blockhash family's statistic-vs-mean
    rule on genuine pixels, with EXACT integer comparisons only, so
    the hash is bit-reproducible and format-independent (the same
    raster encoded as PGM and as BMP collides — the perceptual
    property the hash exists for). Other formats raise.

    ``fake=True`` runs the deterministic stand-in through identical
    Arrow plumbing: 48 byte-value histogram bins (value mod 48), bit
    j set iff ``48·count_j > total_bytes`` — the same integer
    statistic-vs-mean shape over raw bytes (the DuckDB oracle replays
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

    def _real_phash(payload: bytes) -> int:
        if not payload:
            return 0
        cells = resize_nearest(
            luminance(decode_raster(payload)), width=8, height=6
        ).reshape(-1)
        total = int(cells.sum())
        h = 0
        for j, c in enumerate(cells.tolist()):
            if n_bits * int(c) > total:
                h |= 1 << j
        return h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hasher = _fake_phash if fake else _real_phash
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "phash": pdf["payload"].map(hasher).astype("int64"),
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
    """Sample frames from media payloads: one input row fans out to up
    to ``max_frames`` frame rows (1→N expansion inside mapInPandas —
    the batch shape a real ffmpeg-style sampler has; output row count
    is decoupled from input row count).

    ``fake=False`` runs the REAL path for RIFF/WAVE audio: decode the
    PCM and emit every ``every_n``-th 16-SAMPLE window's raw
    little-endian bytes — genuine waveform windows, the audio analogue
    of keyframe sampling. Video codecs are not in this environment, so
    non-WAVE payloads raise. The deterministic stand-in (``fake=True``)
    treats the raw payload as a byte stream of fixed-size 16-byte
    "frames" and takes every ``every_n``-th one.
    """
    frame_bytes = 16  # fake path: bytes per frame; real: samples/window

    def _real_frames(mid, payload: bytes, ids, idxs, frames) -> None:
        if payload[:4] != b"RIFF":
            raise NotImplementedError(
                "real frame sampling supports RIFF/WAVE audio only in "
                "this environment (video codecs unavailable); run with "
                "fake=True for the deterministic stand-in"
            )
        _rate, samples = decode_wav(payload)
        n = samples.size // frame_bytes
        for k, f in enumerate(range(0, n, every_n)):
            if k >= max_frames:
                break
            ids.append(mid)
            idxs.append(f)
            frames.append(
                samples[f * frame_bytes : (f + 1) * frame_bytes].tobytes()
            )

    def _fake_frames(mid, payload: bytes, ids, idxs, frames) -> None:
        n = len(payload) // frame_bytes
        for k, f in enumerate(range(0, n, every_n)):
            if k >= max_frames:
                break
            ids.append(mid)
            idxs.append(f)
            frames.append(
                bytes(payload[f * frame_bytes : (f + 1) * frame_bytes])
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        emit = _fake_frames if fake else _real_frames
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                emit(mid, bytes(payload), ids, idxs, frames)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
