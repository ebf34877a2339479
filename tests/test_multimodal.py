"""Multimodal binary-column plumbing: real Spark path, stubbed codec."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_platform_spark.multimodal.binary import (
    attach_binary_payload,
    binary_metadata,
    decode_media,
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
    ):
        with pytest.raises(Exception) as exc_info:
            op()
        assert "NotImplementedError" in str(exc_info.value) or isinstance(
            exc_info.value, NotImplementedError
        )
