"""Multimodal column plumbing: binary media + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with typed metadata structs, and decodes/extracts on
executors in Arrow batches (``mapInPandas``) — never on the driver. The
image/audio codec libraries are not in this container, so the actual decode
kernel is STUBBED: ``decode_media(..., codec="real")`` raises
``NotImplementedError`` at the call site where PIL/ffmpeg would plug in,
and ``codec="fake"`` runs a deterministic fake decoder (shape and metadata
derived from the bytes themselves) so every piece of Spark-side plumbing —
schema, batch iteration, partition behavior, column pruning — is real and
tested end-to-end.

The partitioning contract: media rows are large and skewed; callers
repartition by ``media_id`` (or bucket on it) before decode so one giant
video can't serialize a whole partition behind it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("meta_mime", StringType(), True),
        StructField("meta_source", StringType(), True),
    ]
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_hash", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture: the
    text bytes stand in for an encoded payload (the container has no real
    media fixtures). Kind cycles by doc_id so all three branches exercise."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("meta_mime"),
        F.col("source").alias("meta_source"),
    )


def _make_fake_decoder():
    """Build the fake-decode kernel as a closure so cloudpickle ships it BY
    VALUE to executors — the workers must not need `etl_pipeline_spark`
    importable (the engine may be driven from any cwd/PYTHONPATH)."""
    feature_columns = [f.name for f in MEDIA_FEATURE_SCHEMA.fields]

    def fake_decode(pdf):
        import hashlib as _hashlib

        import pandas as _pd

        out = []
        for _, row in pdf.iterrows():
            payload = bytes(row["payload"])
            digest = _hashlib.md5(payload).hexdigest()
            h = int(digest[:8], 16)
            out.append(
                {
                    "media_id": row["media_id"],
                    "kind": row["kind"],
                    "n_bytes": len(payload),
                    "content_hash": digest,
                    "width": 64 + (h % 512) if row["kind"] == "image" else None,
                    "height": 64 + ((h >> 9) % 512) if row["kind"] == "image" else None,
                    "channels": 3
                    if row["kind"] == "image"
                    else (1 if row["kind"] == "audio" else None),
                }
            )
        return _pd.DataFrame(out, columns=feature_columns)

    return fake_decode


def fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder (driver-side entry for unit tests)."""
    return _make_fake_decoder()(pdf)


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode/feature-extract media payloads in Arrow batches on executors.

    ``codec="real"`` is the integration point for PIL/torchaudio/ffmpeg —
    deliberately unimplemented in this container. ``codec="fake"`` exercises
    the identical plumbing with a deterministic kernel.
    """
    if codec == "real":
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg/torchaudio) are not available in "
            "this environment; use codec='fake' for the deterministic test kernel"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    kernel = _make_fake_decoder()

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield kernel(pdf)

    return media.mapInPandas(_decode, schema=MEDIA_FEATURE_SCHEMA)
