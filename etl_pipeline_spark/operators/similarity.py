"""Similarity-search operators over embedding DataFrames.

Cosine math is built-in higher-order functions (`zip_with`/`aggregate`) in
double precision — JVM-side, left-to-right fold, bit-reproducible (and
matched by the DuckDB oracles in plans/llm.py).

Two search paths:
- `cosine_topk`: brute force — broadcast the (small) query set against the
  partitioned corpus; exact, O(|q|·|corpus|).
- `sign_lsh_topk`: search only within sign-quantization buckets — the
  approximate scale path; the bucket id is the shuffle/partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def cosine_expr(a: str, b: str) -> Column:
    """cos(a, b) as a Column over two array<float|double> columns."""
    return F.expr(_DOT.format(a=a, b=b)) / (
        F.expr(_NORM.format(v=a)) * F.expr(_NORM.format(v=b))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, cosine)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"))
    scored = q.join(c, F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine_expr("qe", "ce").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "cosine")
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def sign_bucket(vec_col: str, dims: tuple[int, ...]) -> Column:
    """Sign-quantization bucket id from fixed 1-indexed dimensions."""
    col = F.col(vec_col)
    acc: Column = F.lit(0)
    for i, d in enumerate(dims):
        acc = acc + F.when(F.element_at(col, d) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


def sign_lsh_topk(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 17, 33, 49),
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket."""
    b = corpus.select(
        F.col(id_col), F.col(vec_col), sign_bucket(vec_col, dims).alias("bucket")
    )
    q = b.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"), F.col("bucket")
    )
    c = b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ce"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = q.join(
        c, (F.col("bucket") == F.col("c_bucket")) & (F.col("neighbor_id") != F.col("query_id"))
    ).select("query_id", "neighbor_id", "bucket", cosine_expr("qe", "ce").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id", "neighbor_id", "bucket", F.row_number().over(w).alias("rank"), "cosine"
        )
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "bucket", "rank", F.round("cosine", 6).alias("cosine"))
    )


def cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
) -> DataFrame:
    """Embedding-space near-dup pairs (all-pairs; gate behind buckets at
    scale): (vec_a, vec_b, cosine ≥ threshold)."""
    a = corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    b = corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    cos = cosine_expr("ea", "eb").alias("cosine")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos)
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )
