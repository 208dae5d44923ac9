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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.dedup import shingles

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
    # NULL bodies follow the EMPTY-doc convention (one chunk, zero
    # tokens): without the coalesce, Spark's null-skipping greatest/
    # least/concat_ws fabricate a (n_tokens=20, chunk_text='') row while
    # DuckDB emits NULLs — a silent value divergence (probe-found via a
    # planted NULL document body).
    return (
        tokenize(df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))), text_col)
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


def eval_contamination(
    docs: DataFrame,
    eval_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_common: int = 2,
) -> DataFrame:
    """Benchmark decontamination: word-n-gram overlap of every training
    document against every held-out eval document.

    ``eval_pred`` (over ``doc_id``) splits the corpus; a (train, eval) pair
    is reported when they share at least ``min_common`` distinct shingles,
    with ``contamination`` = shared / |eval shingles| — the fraction of the
    eval document's n-grams leaked into that training document.

    Scale shape: the eval side (a benchmark suite) is tiny relative to a
    100 TB train corpus, so its shingle relation is broadcast — the big
    train-shingle scan never shuffles; only matching (train, eval) pairs
    reach the counting aggregate.
    """
    sh = shingles(docs, id_col, text_col, n)
    ev = sh.filter(eval_pred)
    tr = sh.filter(~eval_pred)
    sizes = ev.groupBy(F.col("doc_id").alias("eval_doc")).agg(F.count(F.lit(1)).alias("n"))
    inter = (
        tr.alias("t")
        .join(F.broadcast(ev.alias("e")), F.col("t.shingle") == F.col("e.shingle"))
        .groupBy(F.col("t.doc_id").alias("train_doc"), F.col("e.doc_id").alias("eval_doc"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    return inter.join(F.broadcast(sizes), "eval_doc").select(
        "train_doc",
        "eval_doc",
        "n_common",
        F.round(F.col("n_common") / F.col("n"), 6).alias("contamination"),
    )


def repetition_metrics(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Returns (doc_id, n_tokens, top_token_frac, top_bigram_frac,
    distinct_ratio): the token share of the most frequent token, the token
    share covered by the most frequent bigram (count × 2 / n_tokens), and
    the distinct-token ratio. High top-*-frac / low distinct_ratio flags
    degenerate repetitive text for corpus filtering.

    Two shuffles, both keyed on (doc_id, gram) then doc_id — partial
    aggregation absorbs the repetition itself, so shuffle volume is the
    number of *distinct* grams per doc, not token volume. Documents with
    fewer than two tokens are omitted (no bigram exists).
    """
    t = docs.select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks"))
    tok = t.select("doc_id", F.explode("toks").alias("tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    ts = tc.groupBy("doc_id").agg(
        F.max("c").alias("top_tok"), F.count(F.lit(1)).alias("n_distinct")
    )
    sz = t.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
    bg_expr = "transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', toks[i-1], toks[i]))"
    bg = t.filter(F.size("toks") >= 2).select("doc_id", F.explode(F.expr(bg_expr)).alias("bg"))
    bs = (
        bg.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"))
    )
    return (
        ts.join(sz, "doc_id")
        .join(bs, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("top_tok") / F.col("n_tokens"), 6).alias("top_token_frac"),
            F.round(F.lit(2.0) * F.col("top_bg") / F.col("n_tokens"), 6).alias("top_bigram_frac"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
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
