"""Text-preparation operators for training-data pipelines: chunking + BM25.

Beyond the reference's surface (its only text handling is name
sanitization, `etl/utils/sanitize.py:8-13` in the reference): an LLM-data
pipeline needs to split documents into overlapping token windows for
context-length-bounded training, and to score documents against keyword
queries for corpus curation. Both are expressed with built-in Spark
primitives only — `split`/`sequence`/`explode`/`slice` for chunking, one
explode + two aggregates + broadcast joins for BM25 — so they stay inside
whole-stage codegen and scale with token count, not documents².

Scale notes:
- ``chunk_tokens``: narrow (no shuffle) — each input row explodes into
  ceil(n_tokens / stride) output rows locally; output size is bounded by
  (chunk/stride)× the token volume, and partition sizing follows the
  input's, so the operator survives any SF unchanged.
- ``bm25_scores``: one shuffle to aggregate term frequencies per (doc,
  term), one tiny per-term document-frequency aggregate (|terms| rows —
  broadcast back), one doc-length aggregate re-using the same doc_id
  partitioning. Query terms are filtered BEFORE the tf aggregation, so
  the big shuffle carries only matching tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append a whitespace token array column ``toks``."""
    return df.withColumn("toks", F.split(F.trim(F.col(text_col)), _WS))


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 20,
    stride: int = 15,
) -> DataFrame:
    """Split each document into overlapping token windows.

    Window ``i`` covers 1-based token positions ``[1 + i*stride,
    1 + i*stride + chunk_size - 1]``; the last window may be shorter.
    Deterministic, order-free, and expressible identically in ANSI SQL
    (DuckDB: ``generate_series`` + list slice), so it is oracle-checkable.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    return (
        tokenize(df, text_col)
        .select(
            id_col,
            "toks",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.size("toks"), F.lit(1)), F.lit(stride))
            ).alias("start"),
        )
        .select(
            id_col,
            F.floor((F.col("start") - 1) / stride).cast("bigint").alias("chunk_id"),
            F.least(F.lit(chunk_size), F.size("toks") - F.col("start") + 1)
            .cast("bigint")
            .alias("n_tokens"),
            F.concat_ws(" ", F.expr(f"slice(toks, start, {chunk_size})")).alias("chunk_text"),
        )
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    idf uses the standard smoothed form ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    (never negative). Documents matching none of the terms are absent from
    the result.
    """
    toks = tokenize(df, text_col).select(id_col, F.explode("toks").alias("tok"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs")).join(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    matches = toks.filter(F.col("tok").isin(*terms))
    tf = matches.groupBy(id_col, "tok").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = matches.groupBy("tok").agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("df")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    weight = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(idf * weight).alias("score"))
    )
