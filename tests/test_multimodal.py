"""Multimodal binary-column plumbing: real Spark path, stubbed codec."""

from __future__ import annotations

import pytest

from ecommerce_lakehouse_platform_spark.multimodal.binary import (
    attach_binary_payload,
    binary_metadata,
    decode_media,
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
