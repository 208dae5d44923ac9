"""Relational k-means (Lloyd's algorithm) over embedding vectors.

The classic iterative ML primitive, Spark-first:

- ASSIGN is a zero-exchange narrow projection: the k centroids collapse
  into a ONE-row broadcast array of structs and the per-vector argmin is
  ``array_min(transform(...))`` — the same device the IVF cell assignment
  uses (`operators/similarity.py`). No corpus × k row explosion, no
  shuffle between the corpus scan and the cluster column.
- UPDATE recomputes per-dimension means with one posexplode + groupBy
  (cluster, pos) — the exchange carries k·dim cells after map-side
  partial aggregation, never the corpus.
- Rounds run a FIXED iteration count and every round's centroids are
  rounded to 6 dp (portable FLOOR half-up) before use. The rounding
  collapses the sub-ulp differences partial-agg summation order
  introduces between engines/topologies, so cross-engine parity is
  STABLE AWAY FROM ROUNDING BOUNDARIES — a grouped double SUM landing
  within ~1 ulp of a 0.5e-6 boundary could still round differently and
  (k-means being discontinuous in its centroids) flip an assignment.
  Probability ~0 per cell on real data, and the oracle-parity tests
  would catch it; noted because "bit-identical" would overclaim. The
  DuckDB twin unrolls the rounds as chained CTEs (the PageRank-oracle
  device) and the final assignment matches row-for-row.

Determinism: init = first k vectors by id; distance ties break toward
the smaller cluster id (struct comparison on (rounded d², j)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_spark.utils.local_rows import values_df


def _cents_one_row(centroids: DataFrame) -> DataFrame:
    """(j, ce) rows → ONE row holding array<struct<j, ce>> sorted by j."""
    return F.broadcast(
        centroids.agg(
            F.sort_array(F.collect_list(F.struct("j", "ce"))).alias("cents")
        )
    )


def _assign_expr() -> str:
    """cluster id = argmin over the broadcast centroid array of the
    6-dp-rounded squared L2 distance (integer-scaled for the struct
    comparison), ties to the smaller j."""
    dist = (
        "aggregate(zip_with(embedding, c.ce,"
        " (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),"
        " CAST(0.0 AS DOUBLE), (a, b) -> a + b)"
    )
    return (
        f"array_min(transform(cents, c -> struct("
        f"CAST(FLOOR({dist} * 1e6 + 0.5) AS BIGINT) AS d, c.j AS j))).j"
    )


def _round6_col(c) -> F.Column:
    return F.expr(f"FLOOR({c} * 1e6 + 0.5) / 1e6")


def kmeans_fit_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    n_iter: int = 3,
) -> DataFrame:
    """(vec_id, cluster) after ``n_iter`` Lloyd rounds from first-k init.

    Fixed rounds + per-round 6-dp centroid rounding (see module
    docstring) keep the result deterministic and engine-portable.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")

    emb = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).persist()

    # init: first k vectors by id, rounded like every later round
    first_k = emb.orderBy("vec_id").limit(k).collect()
    if not first_k:
        # empty corpus → empty assignment, matching the oracle's empty
        # result (empty-input probe, r11), not an exception
        from pyspark.sql.types import IntegerType, StructField, StructType

        emb.unpersist()
        return corpus.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("vec_id", corpus.schema[id_col].dataType),
                    StructField("cluster", IntegerType()),
                ]
            ),
        )
    import math

    init = [
        (j, [math.floor(float(x) * 1e6 + 0.5) / 1e6 for x in r.embedding])
        for j, r in enumerate(first_k)
    ]
    # LocalRelation, not a parallelized python list: the init table is
    # re-scanned by every Lloyd round's broadcast build, and a pickled-RDD
    # table costs a cores-wide stage of Python round-trips per scan
    centroids = values_df(emb.sparkSession, init, "j int, ce array<double>")

    assigned = None
    for t in range(n_iter):
        assigned = emb.crossJoin(_cents_one_row(centroids)).select(
            "vec_id",
            "embedding",
            F.expr(_assign_expr()).cast("int").alias("cluster"),
        )
        if t == n_iter - 1:
            break  # the final update would never be read
        cells = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("pos", "v0")
            )
            .select("cluster", "pos", F.col("v0").cast("double").alias("v"))
            .groupBy("cluster", "pos")
            .agg(_round6_col("SUM(v) / COUNT(*)").alias("c"))
        )
        centroids = (
            cells.groupBy(F.col("cluster").alias("j"))
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, c))),"
                    " s -> s.c)"
                ).alias("ce")
            )
            .localCheckpoint(eager=True)
        )
    return assigned.select("vec_id", "cluster")
