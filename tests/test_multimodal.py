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


def test_resize_images_only_and_deterministic(spark):
    from etl_pipeline_spark.operators.multimodal import (
        media_table_from_documents,
        resize_media,
    )
    from etl_pipeline_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = media_table_from_documents(docs)
    n_images = media.filter("kind = 'image'").count()
    out = resize_media(media, 8, 4)
    rows = out.collect()
    assert len(rows) == n_images
    assert all(r.width == 8 and r.height == 4 and len(r.thumb) == 32 for r in rows)
    again = {r.media_id: bytes(r.thumb) for r in resize_media(media, 8, 4).collect()}
    assert {r.media_id: bytes(r.thumb) for r in rows} == again


def test_resize_filter_stays_jvm_side(spark):
    from etl_pipeline_spark.operators.multimodal import (
        media_table_from_documents,
        resize_media,
    )
    from etl_pipeline_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        resize_media(media_table_from_documents(docs), 8, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the kind='image' predicate must run BEFORE the Python stage
    assert plan.index("Filter") > plan.index("MapInPandas") or "image" in plan.split("MapInPandas")[1]


def test_frame_sampling_explodes_bounded(spark):
    from etl_pipeline_spark.operators.multimodal import (
        media_table_from_documents,
        sample_frames,
    )
    from etl_pipeline_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = media_table_from_documents(docs)
    n_videos = media.filter("kind = 'video'").count()
    frames = sample_frames(media, max_frames=4).collect()
    per = {}
    for r in frames:
        per.setdefault(r.media_id, []).append(r.frame_idx)
    assert len(per) == n_videos
    for idxs in per.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense, 0-based
        assert 1 <= len(idxs) <= 4
    assert all(len(bytes(r.frame_payload)) == 16 for r in frames)


def test_real_codecs_are_explicit_stubs(spark):
    import pytest as _pytest

    from etl_pipeline_spark.operators.multimodal import (
        media_table_from_documents,
        resize_media,
        sample_frames,
    )
    from etl_pipeline_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = media_table_from_documents(docs)
    with _pytest.raises(NotImplementedError):
        resize_media(media, 8, 8, codec="real")
    with _pytest.raises(NotImplementedError):
        sample_frames(media, codec="real")


def test_ahash_planted_neardups_recovered(spark):
    """Length-preserving 3-byte edits must come back as small-Hamming
    pairs via the banded LSH; unrelated images must not pair up."""
    import os

    from etl_pipeline_spark.plans.multimodal_plan import multimodal_ahash_neardup

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    rows = multimodal_ahash_neardup(spark, sf_dir).collect()
    planted = [r for r in rows if r.media_b == r.media_a + 100000]
    n_images = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "doc_id % 3 = 0"
    ).count()
    assert len(planted) >= 0.9 * n_images  # high recall on planted pairs
    assert all(r.hamming <= 8 for r in rows)
    assert not [r for r in rows if r.media_b != r.media_a + 100000]  # no FPs


def test_ahash_real_codec_stubbed(spark):
    import pytest as _pytest

    from etl_pipeline_spark.operators.multimodal import perceptual_ahash

    df = spark.createDataFrame([(1, bytearray(b"x" * 64))], "media_id long, payload binary")
    with _pytest.raises(NotImplementedError):
        perceptual_ahash(df, codec="real")


def test_audio_band_energies_partition_payload(spark):
    from etl_pipeline_spark.operators.multimodal import audio_band_energies

    # 16 bytes of known values -> 8 bands of 2 bytes each
    payload = bytes(range(16))
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = {r.band: r for r in audio_band_energies(df, n_bands=8).collect()}
    assert set(rows) == set(range(8))
    for b in range(8):
        assert rows[b].n_in_band == 2
        assert rows[b].energy == (2 * b + (2 * b + 1)) / 2.0
