"""Multimodal binary-column plumbing: real Spark path, stubbed codec."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_platform_spark.multimodal.binary import (
    attach_binary_payload,
    binary_metadata,
    decode_media,
    media_phash,
    resize_media,
    sample_frames,
)
from ecommerce_lakehouse_platform_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def test_fake_decode_schema_and_shape(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = attach_binary_payload(docs)
    decoded = decode_media(media, fake=True)
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.media_type == "image"
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-9
        assert r.byte_len > 0


def test_real_decode_unknown_format_raises(spark):
    """fake=False on a payload with no supported codec (raw text
    bytes) fails loudly instead of fabricating features."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(2)
    media = attach_binary_payload(docs)
    with pytest.raises(Exception) as exc_info:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_metadata_never_decodes(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    meta = binary_metadata(attach_binary_payload(docs))
    rows = meta.limit(5).collect()
    assert all(len(r.content_sha256) == 64 for r in rows)


def test_fake_resize_size_contract(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    media = attach_binary_payload(docs)
    resized = resize_media(media, width=8, height=4, fake=True)
    rows = resized.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.width, r.height) == (8, 4)
        assert len(r.payload) == 32
    # deterministic: same input → same bytes across runs
    again = {r.media_id: bytes(r.payload) for r in resized.collect()}
    assert {r.media_id: bytes(r.payload) for r in rows} == again


def test_frame_sampling_fan_out(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    media = attach_binary_payload(docs)
    frames = sample_frames(media, every_n=4, max_frames=8, fake=True)
    rows = frames.collect()
    by_id: dict[int, list[int]] = {}
    for r in rows:
        assert len(r.frame) == 16
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    # 1→N expansion: docs are long enough that every video yields
    # multiple frames, capped at max_frames, stride every_n
    assert by_id and all(1 <= len(v) <= 8 for v in by_id.values())
    for idxs in by_id.values():
        assert idxs == sorted(idxs)
        assert all(i % 4 == 0 for i in idxs)


def test_unknown_format_payloads_raise(spark):
    """Every real-path media op rejects a payload with no supported
    codec (raw text bytes) instead of silently faking."""
    media = attach_binary_payload(
        load_table(spark, SF_SMOKE, "documents").limit(2)
    )
    for op in (
        lambda: resize_media(media, 4, 4).collect(),
        lambda: sample_frames(media).collect(),
        lambda: media_phash(media).collect(),
    ):
        with pytest.raises(Exception) as exc_info:
            op()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )


def test_fake_phash_matches_reference_bits(spark):
    """The stand-in perceptual hash must equal the documented pure-
    Python reference (48 byte-value bins, exact integer 48·cnt > total
    threshold) — and identical payloads must collide (the dedup
    contract)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = attach_binary_payload(docs)
    got = {r.media_id: r.phash for r in media_phash(media, fake=True).collect()}

    def ref(payload: bytes) -> int:
        if not payload:
            return 0
        counts = [0] * 48
        for b in payload:
            counts[b % 48] += 1
        return sum(
            1 << j for j in range(48) if 48 * counts[j] > len(payload)
        )

    want = {
        r.doc_id: ref(r.text.encode()) for r in docs.collect()
    }
    assert got == want
    assert all(0 <= h < (1 << 48) for h in got.values())
    # collision contract: identical payloads collide, and the empty
    # payload hashes to 0
    dup = spark.createDataFrame(
        [(1, "image", b"same bytes"), (2, "image", b"same bytes"),
         (3, "image", b"")],
        schema="media_id long, media_type string, payload binary",
    )
    hashes = {r.media_id: r.phash for r in media_phash(dup, fake=True).collect()}
    assert hashes[1] == hashes[2]
    assert hashes[3] == 0


# ---------------------------------------------------------------------------
# Real codecs: netpbm P5/P6 and uncompressed 24-bit BMP
# ---------------------------------------------------------------------------


def test_netpbm_round_trip_and_comments():
    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        decode_netpbm,
        encode_netpbm,
    )

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(decode_netpbm(encode_netpbm(gray)), gray)
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    assert np.array_equal(decode_netpbm(encode_netpbm(rgb)), rgb)
    # header comments between tokens are legal netpbm
    commented = b"P5\n# made by hand\n4 # w then h\n3\n255\n" + bytes(range(12))
    assert np.array_equal(
        decode_netpbm(commented), np.arange(12, dtype=np.uint8).reshape(3, 4)
    )
    with pytest.raises(ValueError):
        decode_netpbm(b"P3\n1 1\n255\n0")  # ASCII netpbm unsupported
    with pytest.raises(ValueError):
        decode_netpbm(b"P5\n1 1\n65535\n\x00\x00")  # 2-byte maxval


def test_bmp_round_trip_with_row_padding():
    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        decode_bmp,
        encode_bmp,
    )

    # width 3 → 9-byte rows padded to 12: the padding path is exercised
    rgb = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    payload = encode_bmp(rgb)
    assert payload[:2] == b"BM"
    assert np.array_equal(decode_bmp(payload), rgb)
    with pytest.raises(ValueError):
        decode_bmp(b"PNG not really")


def test_resize_nearest_exact_index_map():
    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        resize_nearest,
    )

    src = np.arange(96, dtype=np.uint8).reshape(8, 12)
    out = resize_nearest(src, width=5, height=3)
    ys = [(y * 8) // 3 for y in range(3)]
    xs = [(x * 12) // 5 for x in range(5)]
    expect = np.array([[src[y, x] for x in xs] for y in ys], dtype=np.uint8)
    assert np.array_equal(out, expect)
    # upscale replicates source pixels, never interpolates
    up = resize_nearest(np.array([[0, 255]], dtype=np.uint8), 4, 1)
    assert up.tolist() == [[0, 0, 255, 255]]


def test_real_resize_runs_on_genuine_pixels(spark):
    """fake=False end-to-end through the Arrow plumbing: PGM payloads
    built JVM-side, decoded and resampled by the REAL codec, and the
    output re-decodes to exactly the source pixels under the floor
    index map."""
    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        attach_pgm_payload,
        decode_netpbm,
        resize_media,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(5)
    media = attach_pgm_payload(docs, width=12, height=8)
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    out = resize_media(media, width=5, height=3, fake=False).collect()
    assert len(out) == 5
    for row in out:
        assert (row.width, row.height) == (5, 3)
        resized = decode_netpbm(bytes(row.payload))
        assert resized.shape == (3, 5)
        original = decode_netpbm(src[row.media_id])
        ys = [(y * 8) // 3 for y in range(3)]
        xs = [(x * 12) // 5 for x in range(5)]
        assert np.array_equal(
            resized, original[np.ix_(ys, xs)]
        ), "real resize must be the exact floor-index resample"


def test_real_resize_bmp_payloads(spark):
    """The BMP branch of the real path, through Spark: encode locally,
    ship as payloads, resize distributed, decode and check."""
    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        decode_bmp,
        encode_bmp,
        resize_media,
        resize_nearest,
    )

    rng = [(i, np.arange(i, i + 48, dtype=np.uint8).reshape(4, 4, 3)) for i in range(3)]
    rows = [(i, "image", bytearray(encode_bmp(a))) for i, a in rng]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: bytes(r.payload)
           for r in resize_media(media, 2, 2, fake=False).collect()}
    for i, arr in rng:
        assert np.array_equal(
            decode_bmp(out[i]), resize_nearest(arr, 2, 2)
        )


def test_real_decode_features_from_pixels(spark):
    """fake=False decode over genuine PGM payloads: the features are
    value-histogram densities of the actual raster, matching a
    pure-Python replica bin for bin."""
    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        attach_pgm_payload,
        decode_netpbm,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(4)
    media = attach_pgm_payload(docs, width=12, height=8)
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    got = {r.media_id: list(r.feature)
           for r in decode_media(media, fake=False).collect()}
    for mid, payload in src.items():
        pixels = decode_netpbm(payload).reshape(-1).tolist()
        counts = [0] * 8
        for v in pixels:
            counts[min(v // 32, 7)] += 1
        expect = [c / len(pixels) for c in counts]
        assert got[mid] == expect


def test_real_phash_is_format_independent(spark):
    """The real blockhash is a function of the PIXELS, not the
    container: the same raster encoded as grayscale PGM and as an RGB
    BMP (all three channels equal) produces the SAME hash — the
    cross-format collision property perceptual hashing exists for —
    and different rasters produce different hashes."""
    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        encode_bmp,
        encode_netpbm,
    )

    rng = np.arange(12 * 8, dtype=np.uint8).reshape(8, 12)
    other = (rng[::-1] * 2 + 7).astype(np.uint8)
    rows = [
        (0, "image", bytearray(encode_netpbm(rng))),
        (1, "image", bytearray(encode_bmp(np.stack([rng] * 3, axis=-1)))),
        (2, "image", bytearray(encode_netpbm(other))),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.phash
           for r in media_phash(media, fake=False).collect()}
    assert got[0] == got[1], "same pixels, different container: must collide"
    assert got[0] != got[2], "different pixels must (here) differ"
    assert got[0] > 0


def test_wav_round_trip_and_real_audio_features(spark):
    """RIFF/WAVE mono PCM16: encode/decode round-trip (with an extra
    LIST chunk skipped per the spec), format guards, and fake=False
    decode_media over genuine audio payloads matching a pure-Python
    amplitude-histogram replica."""
    import struct

    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        decode_wav,
        encode_wav,
    )

    samples = np.array([0, 100, -100, 5000, -32768, 32767], dtype=np.int16)
    payload = encode_wav(samples, sample_rate=8000)
    rate, back = decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(back, samples)
    # an extra chunk between fmt and data is walked over, not tripped on
    pos = 12 + 8 + 16  # after fmt chunk
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    padded = payload[:pos] + extra + payload[pos:]
    riff_len = struct.unpack_from("<I", padded, 4)[0] + len(extra)
    padded = padded[:4] + struct.pack("<I", riff_len) + padded[8:]
    rate2, back2 = decode_wav(padded)
    assert rate2 == 8000 and np.array_equal(back2, samples)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")

    # distributed fake=False decode over audio rows
    rows = [
        (i, "audio", bytearray(encode_wav(
            np.arange(i * 7, i * 7 + 64, dtype=np.int16) * 512
        )))
        for i in range(3)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: list(r.feature)
           for r in decode_media(media, fake=False).collect()}
    for i, _t, payload in rows:
        _r, s = decode_wav(bytes(payload))
        counts = [0] * 8
        for v in s.tolist():
            counts[min(abs(int(v)) // 4096, 7)] += 1
        assert got[i] == [c / s.size for c in counts]


def test_real_frame_sampling_over_wav(spark):
    """fake=False frame sampling on genuine WAVE audio: every 4th
    16-sample window's raw PCM bytes, matching a pure-Python replica;
    non-WAVE payloads still raise."""
    import numpy as np

    from ecommerce_lakehouse_platform_spark.multimodal.binary import (
        MEDIA_SCHEMA,
        decode_wav,
        encode_wav,
    )

    rows = [
        (i, "audio", bytearray(encode_wav(
            np.arange(i * 11, i * 11 + 200, dtype=np.int16) * 123
        )))
        for i in range(2)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r.media_id, r.frame_idx): bytes(r.frame)
        for r in sample_frames(media, every_n=4, max_frames=3,
                               fake=False).collect()
    }
    expect = {}
    for i, _t, payload in rows:
        _r, s = decode_wav(bytes(payload))
        n = s.size // 16
        for k, f in enumerate(range(0, n, 4)):
            if k >= 3:
                break
            expect[(i, f)] = s[f * 16 : (f + 1) * 16].tobytes()
    assert got == expect
