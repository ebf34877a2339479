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


def test_real_decode_is_stubbed(spark):
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


def test_resize_and_sample_stubs_raise(spark):
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
