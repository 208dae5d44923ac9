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
    DoubleType,
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
        # NULLABLE: an absent blob (failed fetch, NULL source column) is
        # in-domain user data — decode emits NULL features for it and the
        # derived extractors (ahash/bands/frames/resize) skip it, the same
        # row-dropping their SQL oracles' NULL propagation produces
        # (probe-found via a planted NULL document body crashing the
        # kernels' bytes(None))
        StructField("payload", BinaryType(), True),
        StructField("meta_mime", StringType(), True),
        StructField("meta_source", StringType(), True),
    ]
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),  # NULL for absent blobs
        StructField("content_hash", StringType(), True),
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
            channels = (
                3
                if row["kind"] == "image"
                else (1 if row["kind"] == "audio" else None)
            )
            if row["payload"] is None:
                # absent blob: NULL byte/hash/dim features, kind-derived
                # channels stay — mirrors the oracle's NULL propagation
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": None,
                        "content_hash": None,
                        "width": None,
                        "height": None,
                        "channels": channels,
                    }
                )
                continue
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
                    "channels": channels,
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("thumb", BinaryType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)


def resize_media(
    media: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Image resize → fixed-dimension thumbnails (training-shard prep).

    Non-image rows are filtered out BEFORE the Python stage (a JVM-side
    predicate — the expensive kernel only ever sees image bytes). The fake
    kernel emits deterministic pseudo-thumbnails (md5-keystream bytes of
    the target size); ``codec="real"`` is the PIL/cv2 integration point.
    """
    if codec == "real":
        raise NotImplementedError("real image resize needs PIL/cv2; use codec='fake'")
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")
    n_out = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["payload"] is None:  # absent blob: nothing to resize
                    continue
                seed = _hashlib.md5(bytes(row["payload"])).digest()
                reps = (n_out // len(seed)) + 1
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "width": width,
                        "height": height,
                        "thumb": (seed * reps)[:n_out],
                    }
                )
            yield _pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(
        _resize, schema=RESIZED_SCHEMA
    )


def sample_frames(
    media: DataFrame, max_frames: int = 4, codec: str = "fake"
) -> DataFrame:
    """Video frame sampling: one input row explodes to ≤ ``max_frames``
    frame rows — the row-multiplying shape (and the reason frame sampling
    runs AFTER a repartition on media_id: a long video's frames spread
    across the partition instead of serializing behind one task).

    Fake kernel: frame count = payload-length-derived (deterministic),
    frame bytes = md5 over (payload, frame_idx). ``codec="real"`` is the
    ffmpeg/pyav integration point.
    """
    if codec == "real":
        raise NotImplementedError("real frame sampling needs ffmpeg/pyav; use codec='fake'")
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if row["payload"] is None:  # absent blob: no frames
                    continue
                payload = bytes(row["payload"])
                n = min(max_frames, 1 + len(payload) % max_frames)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "frame_payload": _hashlib.md5(
                                payload + i.to_bytes(4, "big")
                            ).digest(),
                        }
                    )
            yield _pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("ahash_hi", LongType(), False),
        StructField("ahash_lo", LongType(), False),
    ]
)


def perceptual_ahash(media: DataFrame, codec: str = "fake") -> DataFrame:
    """64-bit average-hash per image payload, as two 32-bit halves.

    The aHash recipe (8×8 downsample → bit = pixel > mean) is the cheapest
    perceptual image fingerprint; similar images differ in a few bits, so
    near-duplicate detection is banded-LSH + Hamming verify — the exact
    machinery the SimHash text path uses, applied to the image modality.

    ``codec="real"`` is where PIL decoding + true 8×8 luma downsampling
    plug in (unavailable in this container); ``codec="fake"`` derives the
    64 "pixels" by sampling the raw payload bytes at 64 evenly-spaced
    offsets — deterministic, recomputable in SQL (the oracle), and
    similarity-preserving for near-identical payloads (most sampled bytes
    agree, so most bits agree — the property the LSH banding needs).

    Two 32-bit halves (not one 64-bit value) keep every integer positive:
    bit 63 of a single BIGINT hash flips its sign and makes shift/sum
    behavior engine-dependent.
    """
    if codec == "real":
        raise NotImplementedError(
            "real image decoding (PIL) is not available in this environment; "
            "use codec='fake' for the deterministic byte-sampling kernel"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def _ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, his, los = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # absent blob: no hash row (the
                    continue  # oracle's NULL chain emits no pixels)
                data = bytes(payload)
                n = len(data)
                if n == 0:  # empty payload: all-zero hash, no crash
                    ids.append(mid)
                    his.append(0)
                    los.append(0)
                    continue
                pixels = [data[(i * n) // 64] for i in range(64)]
                mean = sum(pixels) / 64.0
                hi = lo = 0
                for i, p in enumerate(pixels):
                    if p > mean:
                        if i < 32:
                            lo |= 1 << i
                        else:
                            hi |= 1 << (i - 32)
                ids.append(mid)
                his.append(hi)
                los.append(lo)
            yield _pd.DataFrame(
                {"media_id": ids, "ahash_hi": his, "ahash_lo": los}
            )

    return media.select("media_id", "payload").mapInPandas(_ahash, AHASH_SCHEMA)


AUDIO_BANDS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("band", IntegerType(), False),
        StructField("n_in_band", IntegerType(), False),
        StructField("energy", DoubleType(), False),
    ]
)


def audio_band_energies(
    media: DataFrame, n_bands: int = 8, codec: str = "fake"
) -> DataFrame:
    """Per-band mean signal energy per audio payload — the feature block
    a speech/music pipeline extracts before filtering (silence, clipping,
    bandwidth checks).

    ``codec="real"`` is where torchaudio/librosa STFT band energies plug
    in (unavailable in this container); ``codec="fake"`` treats the raw
    payload bytes as 8-bit samples and partitions them into ``n_bands``
    contiguous segments (sample i → band (i·n_bands)//n) — deterministic
    and SQL-recomputable, with the mean computed as Σ/| | in both engines.
    Energies use the portable FLOOR(x·1e6+0.5)/1e6 half-up (small-integer
    rationals land exactly on native ROUND() tie boundaries).
    """
    if codec == "real":
        raise NotImplementedError(
            "real audio decoding (torchaudio/librosa) is not available in "
            "this environment; use codec='fake' for the byte-sample kernel"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    if n_bands < 1:
        raise ValueError(f"n_bands must be >= 1, got {n_bands}")

    import math as _math

    def _bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            ids, bands, counts, energies = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # absent blob: no bands (the oracle's
                    continue  # len(NULL) series is empty)
                data = bytes(payload)
                n = len(data)
                if n == 0:  # empty payload: no bands, no crash
                    continue
                sums = [0] * n_bands
                cnts = [0] * n_bands
                for i, byte in enumerate(data):
                    b = (i * n_bands) // n
                    sums[b] += byte
                    cnts[b] += 1
                for b in range(n_bands):
                    if cnts[b] == 0:
                        continue
                    mean = sums[b] / cnts[b]
                    ids.append(mid)
                    bands.append(b)
                    counts.append(cnts[b])
                    energies.append(_math.floor(mean * 1e6 + 0.5) / 1e6)
            yield _pd.DataFrame(
                {
                    "media_id": ids,
                    "band": bands,
                    "n_in_band": counts,
                    "energy": energies,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        _bands, AUDIO_BANDS_SCHEMA
    )
