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
