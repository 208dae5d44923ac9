"""Multimodal plumbing: binary payload + mapInPandas decode (fake kernel)."""

from __future__ import annotations

import hashlib

import pytest

from etl_pipeline_spark.operators.multimodal import (
    MEDIA_FEATURE_SCHEMA,
    decode_media,
    media_table_from_documents,
)
from etl_pipeline_spark.sources.star import load_table
from tests.conftest import SF_DIR


def test_decode_media_fake_kernel(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    media = media_table_from_documents(docs).repartition(4, "media_id")
    feats = decode_media(media, codec="fake")
    assert feats.schema == MEDIA_FEATURE_SCHEMA
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 30
    # deterministic: hash of the payload bytes drives fake dimensions
    src = {r.doc_id: r.text for r in docs.collect()}
    for mid, r in rows.items():
        digest = hashlib.md5(src[mid].encode()).hexdigest()
        assert r.content_hash == digest
        assert r.n_bytes == len(src[mid].encode())
        if r.kind == "image":
            assert r.width == 64 + (int(digest[:8], 16) % 512)
            assert r.channels == 3
        elif r.kind == "audio":
            assert r.channels == 1 and r.width is None
        else:
            assert r.channels is None


def test_real_codec_is_explicit_stub(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(1)
    media = media_table_from_documents(docs)
    with pytest.raises(NotImplementedError, match="not available"):
        decode_media(media, codec="real")
