"""Multimodal decode pipeline as a registry query (SURVEY §7 north star).

`operators/multimodal.py` carries binary payloads + typed metadata and
decodes in Arrow batches on executors; the real codec is stubbed (no media
libraries in this container) behind a deterministic md5-derived fake. That
determinism makes the WHOLE pipeline oracle-checkable: DuckDB recomputes
the fake decoder's outputs (byte length, md5, hex-derived dimensions) in
SQL, so the mapInPandas plumbing — schema, batch iteration, null typing
per modality — is hash-verified cell-for-cell, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_spark.operators.multimodal import decode_media, media_table_from_documents
from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.star import load_table

# integer value of the first 8 hex chars of md5(text) — the same instr-based
# decode the simhash oracle uses (no shared hash-to-int builtin exists)
_H = " + ".join(
    f"CAST(instr('0123456789abcdef', substr(md5(text), {i + 1}, 1)) - 1 AS BIGINT)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)


@register(
    "multimodal_decode_features",
    oracle=f"""
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_hash,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(64 + ({_H}) % 512 AS INTEGER) END AS width,
               CASE WHEN doc_id % 3 = 0
                    THEN CAST(64 + (({_H}) // 512) % 512 AS INTEGER) END AS height,
               CASE doc_id % 3 WHEN 0 THEN 3 WHEN 1 THEN 1 END AS channels
        FROM documents
    """,
    tags=("llm", "multimodal"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(media_table_from_documents(docs), codec="fake")


# --------------------------------------------------------------------------
# Perceptual near-duplicate images: 64-bit aHash (two 32-bit halves) →
# 4×16-bit banded LSH → Hamming verify on candidates only — the SimHash
# text machinery applied to the image modality. The fake kernel samples
# payload bytes at 64 evenly-spaced offsets (similarity-preserving for
# length-preserving edits and SQL-recomputable); `codec="real"` swaps in
# PIL luma downsampling with zero plan changes. Corpus is ASCII so byte
# offsets == char offsets in the oracle's substr-based pixel sampling.
# The corpus' planted near-dups change text LENGTH, which shifts every
# sampling offset (the fake analog of a rescaled image) — so the query
# plants its own length-preserving perturbations: each image payload is
# duplicated at media_id+100000 with 3 bytes overwritten ('zzz' at
# offset 4), the image analog of a small local edit. Every planted pair
# must come back with small Hamming distance; unrelated images must not.
#
# Scale guard: band buckets shared by more than _AHASH_MAX_DF images are
# stop-buckets (low-information band values — uniform or common luma
# patterns) and are dropped BEFORE the pair join, the same hot-key cap
# winnowing applies to stop-fingerprints. Without it, candidate cost is
# Σ cnt² over buckets — measured 55× growth at an 8× corpus whose
# replicas share correlated band values. The cap does not bind at any
# tested SF (max bucket 38 at sf0.1 vs cap 64), so recall on planted
# pairs is unchanged; on a pathological corpus it trades recall inside
# degenerate buckets for a bounded join, which is the standard LSH dial.
# --------------------------------------------------------------------------
_AHASH_HAMMING_MAX = 8
_AHASH_MAX_DF = 64


def _ahash_oracle() -> str:
    bands = "\n            UNION ALL ".join(
        f"SELECT media_id, {b} AS band_id, "
        f"({src} >> {16 * (b % 2)}) & 65535 AS band_val FROM h"
        for b, src in ((0, "ahash_lo"), (1, "ahash_lo"), (2, "ahash_hi"), (3, "ahash_hi"))
    )
    return f"""
        WITH imgs AS (
            -- NULL bodies are absent blobs: the kernel skips them (no
            -- hash exists), so the oracle must too — without the filter,
            -- NULL pixels fabricate an all-zero hash that cross-pairs
            -- with every empty payload (probe-found via planted NULLs)
            SELECT doc_id AS media_id, text FROM documents
            WHERE doc_id % 3 = 0 AND text IS NOT NULL
            UNION ALL
            SELECT doc_id + 100000 AS media_id,
                   substr(text, 1, 4) || 'zzz' || substr(text, 8) AS text
            FROM documents WHERE doc_id % 3 = 0 AND text IS NOT NULL
        ),
        px AS (
            SELECT media_id, i.i,
                   ascii(substr(text,
                        CAST((i.i * len(text)) // 64 AS INT) + 1, 1)) AS p
            FROM imgs,
                 (SELECT unnest(generate_series(0, 63)) AS i) i
        ),
        m AS (SELECT media_id, SUM(p) / 64.0 AS mean FROM px GROUP BY media_id),
        h AS (
            SELECT px.media_id,
                   CAST(SUM(CASE WHEN p > m.mean AND i >= 32
                            THEN (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END)
                        AS BIGINT) AS ahash_hi,
                   CAST(SUM(CASE WHEN p > m.mean AND i < 32
                            THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)
                        AS BIGINT) AS ahash_lo
            FROM px JOIN m USING (media_id)
            GROUP BY px.media_id
        ),
        bands AS (
            {bands}
        ),
        bfreq AS (
            SELECT band_id, band_val FROM bands
            GROUP BY 1, 2 HAVING COUNT(*) <= {_AHASH_MAX_DF}
        ),
        kept AS (
            SELECT b.media_id, b.band_id, b.band_val
            FROM bands b JOIN bfreq USING (band_id, band_val)
        ),
        cand AS (
            SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
            FROM kept a
            JOIN kept b ON a.band_id = b.band_id AND a.band_val = b.band_val
                        AND a.media_id < b.media_id
        )
        SELECT c.media_a, c.media_b,
               CAST(bit_count(xor(ha.ahash_hi, hb.ahash_hi))
                    + bit_count(xor(ha.ahash_lo, hb.ahash_lo)) AS INT) AS hamming
        FROM cand c
        JOIN h ha ON ha.media_id = c.media_a
        JOIN h hb ON hb.media_id = c.media_b
        WHERE bit_count(xor(ha.ahash_hi, hb.ahash_hi))
              + bit_count(xor(ha.ahash_lo, hb.ahash_lo)) <= {_AHASH_HAMMING_MAX}
    """


@register(
    "multimodal_ahash_neardup",
    oracle=_ahash_oracle(),
    tags=("llm", "multimodal", "dedup", "lsh"),
)
def multimodal_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.operators.multimodal import perceptual_ahash

    docs = load_table(spark, sf_dir, "documents")
    media = media_table_from_documents(docs).filter(F.col("kind") == "image")
    perturbed = media.select(
        (F.col("media_id") + 100000).alias("media_id"),
        F.expr(
            "cast(concat(substring(payload, 1, 4), encode('zzz', 'UTF-8'),"
            " substring(payload, 8, 2147483647)) as binary)"
        ).alias("payload"),
    )
    both = media.select("media_id", "payload").unionByName(perturbed)
    h = perceptual_ahash(both, codec="fake").persist()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.expr(f"shiftright({src}, {16 * (b % 2)}) & 65535").alias(
                    "band_val"
                ),
            )
            for b, src in (
                (0, "ahash_lo"), (1, "ahash_lo"), (2, "ahash_hi"), (3, "ahash_hi"),
            )
        ]
    )
    bands = h.select("media_id", F.explode(band_structs).alias("b")).select(
        "media_id", "b.band_id", "b.band_val"
    )
    bfreq = (
        bands.groupBy("band_id", "band_val")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _AHASH_MAX_DF)
        .select("band_id", "band_val")
    )
    bands = bands.join(bfreq, ["band_id", "band_val"])
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .distinct()
    )
    ha = h.select(
        F.col("media_id").alias("media_a"),
        F.col("ahash_hi").alias("hi_a"),
        F.col("ahash_lo").alias("lo_a"),
    )
    hb = h.select(
        F.col("media_id").alias("media_b"),
        F.col("ahash_hi").alias("hi_b"),
        F.col("ahash_lo").alias("lo_b"),
    )
    hamming = F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
    return (
        cand.join(ha, "media_a")
        .join(hb, "media_b")
        .filter(hamming <= _AHASH_HAMMING_MAX)
        .select("media_a", "media_b", hamming.cast("int").alias("hamming"))
    )


# --------------------------------------------------------------------------
# Content-addressed video dedup: two videos are duplicates when they share
# their sampled keyframe content hashes — the frame-level analog of
# exact-hash text dedup (a real pipeline stores per-keyframe hashes and
# dedups on them; frame extraction is the only codec-dependent step).
# The Spark side joins on the fake kernel's md5 frame digests; the oracle
# states the SEMANTIC truth the digests encode — frames match iff
# (payload, frame_idx) match — so it needs no BLOB md5 (DuckDB's md5 is
# VARCHAR-only) and simultaneously documents the no-collision assumption
# every hash-dedup relies on. Exact-copy videos are planted at
# media_id+100000, mirroring the image query's planted perturbations.
# --------------------------------------------------------------------------
@register(
    "multimodal_video_frame_dedup",
    oracle="""
        WITH vids AS (
            SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
            UNION ALL
            SELECT doc_id + 100000 AS media_id, text
            FROM documents WHERE doc_id % 3 = 2
        )
        SELECT a.media_id AS video_a, b.media_id AS video_b,
               CAST(1 + (octet_length(encode(a.text)) % 4) AS INT)
                   AS n_shared_frames
        FROM vids a
        JOIN vids b ON a.text = b.text AND a.media_id < b.media_id
    """,
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_video_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = media_table_from_documents(docs).filter(F.col("kind") == "video")
    planted = media.select(
        (F.col("media_id") + 100000).alias("media_id"),
        F.col("kind"),
        F.col("payload"),
    )
    both = media.select("media_id", "kind", "payload").unionByName(planted)
    frames = sample_frames(both, max_frames=4, codec="fake")
    a = frames.select(
        F.col("media_id").alias("video_a"),
        F.col("frame_idx").alias("idx_a"),
        F.col("frame_payload").alias("fa"),
    )
    b = frames.select(
        F.col("media_id").alias("video_b"),
        F.col("frame_idx").alias("idx_b"),
        F.col("frame_payload").alias("fb"),
    )
    return (
        a.join(
            b,
            (F.col("fa") == F.col("fb"))
            & (F.col("idx_a") == F.col("idx_b"))
            & (F.col("video_a") < F.col("video_b")),
        )
        .groupBy("video_a", "video_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_shared_frames"))
    )


# --------------------------------------------------------------------------
# Audio band energies — completes the modality trio (image: perceptual
# aHash; video: content-addressed keyframes; audio: per-band energy
# features). The fake kernel reads payload BYTES as 8-bit samples split
# into 8 contiguous bands. The payload is the UTF-8 encoding of the
# text, so the oracle must walk BYTES, not characters — ascii(substr())
# over character positions silently diverges on any multibyte text
# (sweep-found when the fixture gained a non-ASCII document): both the
# band boundaries (byte count ≠ char count) and the sample values
# (codepoint ≠ byte) shift. The oracle expands each codepoint to its
# UTF-8 bytes arithmetically (1–4 bytes by codepoint range, continuation
# bytes 128 + 6-bit groups) with a per-document prefix-sum byte offset.
# At scale the per-row work is a single Arrow pass; the oracle's
# position explosion is DuckDB-only.
# --------------------------------------------------------------------------
@register(
    "multimodal_audio_features",
    oracle="""
        WITH chars AS (
            SELECT doc_id AS media_id, i.i AS ci,
                   unicode(substr(text, i.i + 1, 1)) AS u,
                   octet_length(encode(text)) AS tot
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(0, len(text) - 1)) AS i) i
            WHERE doc_id % 3 = 1
        ),
        clen AS (
            SELECT media_id, ci, u, tot,
                   CASE WHEN u < 128 THEN 1 WHEN u < 2048 THEN 2
                        WHEN u < 65536 THEN 3 ELSE 4 END AS nb
            FROM chars
        ),
        coff AS (
            SELECT media_id, ci, u, tot, nb,
                   COALESCE(SUM(nb) OVER (PARTITION BY media_id ORDER BY ci
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS boff
            FROM clen
        ),
        px AS (
            SELECT media_id, tot, boff + j.j AS bi,
                   CASE
                     WHEN nb = 1 THEN u
                     WHEN j.j = 0 AND nb = 2 THEN 192 + u // 64
                     WHEN j.j = 0 AND nb = 3 THEN 224 + u // 4096
                     WHEN j.j = 0 THEN 240 + u // 262144
                     WHEN j.j = 1 AND nb = 3 THEN 128 + (u // 64) % 64
                     WHEN j.j = 1 AND nb = 4 THEN 128 + (u // 4096) % 64
                     WHEN j.j = 2 AND nb = 4 THEN 128 + (u // 64) % 64
                     ELSE 128 + u % 64
                   END AS p
            FROM coff,
                 LATERAL (SELECT unnest(generate_series(0, nb - 1)) AS j) j
        )
        SELECT media_id, CAST((bi * 8) // tot AS INT) AS band,
               CAST(COUNT(*) AS INT) AS n_in_band,
               FLOOR((SUM(p) * 1.0e0 / COUNT(*)) * 1e6 + 0.5) / 1e6 AS energy
        FROM px GROUP BY media_id, CAST((bi * 8) // tot AS INT)
    """,
    tags=("llm", "multimodal"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from etl_pipeline_spark.operators.multimodal import audio_band_energies

    docs = load_table(spark, sf_dir, "documents")
    media = media_table_from_documents(docs).filter(F.col("kind") == "audio")
    return audio_band_energies(media, n_bands=8, codec="fake")
