"""Embedding validity convention (r11 probe, bug 45).

At 100 TB an embedding column carries corrupt rows daily: NULL vectors
(unfetched), NULL/NaN/Inf components (failed encoder batches), wrong-
dimension vectors (model-version mixups). The engines disagree on every
one of them — DuckDB's list_dot_product RAISES on NULL components and on
dimension mismatches, Spark's zip_with pads the short side with NULLs,
NaN propagates into TakeOrdered heaps where the engines rank it
differently. Convention: a row participates in embedding computations iff
its vector is non-NULL, exactly EMB_DIM wide, and every component is
non-NULL and finite — the drop-at-ingest rule a production embedding
pipeline applies. Both halves below implement the SAME predicate: every
embedding query loads through ``load_embeddings()`` and every oracle
reads ``FROM {EMB_VALID_ORACLE} <alias>`` so neither engine ever sees an
invalid vector.

Scale note: the Spark predicate is a per-row array scan inside the
parquet-scan stage (no shuffle, whole-stage codegen'd `exists`); at any
corpus size it costs one pass over values already in memory for the
downstream kernel.

Oracle-side caveat (probe-found): DuckDB may CONJOIN a downstream
predicate with the validity filter and evaluate it first, so any
predicate over a possibly-raw embedding must be TOTAL — use
``list_sum(list_transform(...))`` forms (NULL-skipping) instead of
``list_dot_product`` (raising) in WHERE clauses that sit directly over
the validity subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_spark.sources.star import load_table

EMB_DIM = 64

EMB_VALID_ORACLE = (
    "(SELECT vec_id, embedding, label FROM embeddings"
    f" WHERE len(embedding) = {EMB_DIM}"
    " AND coalesce(list_aggregate(list_transform(embedding,"
    " x -> x IS NOT NULL AND isfinite(x)), 'bool_and'), FALSE))"
)

# Label-consuming queries (kNN / NDCG / AUC eval) additionally require a
# label: an unlabeled vector can neither vote nor be scored, and the
# engines seat a NULL label at opposite ends of every vote/rank tiebreak
# (r11 nulls probe). Same shape as the validity convention — drop at load
# in BOTH engines.
EMB_LABELED_ORACLE = (
    f"(SELECT vec_id, embedding, label FROM {EMB_VALID_ORACLE} v"
    " WHERE label IS NOT NULL)"
)


def load_embeddings(
    spark: SparkSession, sf_dir: str, *, dim: int = EMB_DIM
) -> DataFrame:
    """`embeddings` with the validity convention applied (module doc)."""
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "embeddings")
    finite = ~F.exists(
        "embedding",
        lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
    )
    return df.filter((F.size("embedding") == dim) & finite)


def load_labeled_embeddings(
    spark: SparkSession, sf_dir: str, *, dim: int = EMB_DIM
) -> DataFrame:
    """Valid embeddings that also carry a label (EMB_LABELED_ORACLE)."""
    from pyspark.sql import functions as F

    return load_embeddings(spark, sf_dir, dim=dim).filter(
        F.col("label").isNotNull()
    )
