"""Behavioral / statistical analytics queries.

The BI-and-monitoring shapes an operations team runs on the event stream
and the fact tables (no reference analog — the reference logs summaries,
it cannot query them):

- cohort retention — users grouped by first-seen week, activity counted
  per week offset: the canonical retention matrix. Cost: one min-ts
  aggregate + a broadcast join + one distinct-count aggregate; every
  shuffle is keyed on (cohort, offset) or the user id;
- chi-square contingency — event type × day-part independence test with
  per-cell expected counts and contributions; the contingency table is
  types × 4 cells, so everything after the first groupBy is tiny;
- Pearson correlation from explicit moment sums — one map-side-combined
  aggregate pass computes Σx Σy Σxy Σx² Σy² n for every pair; the
  closed-form r is written with identical parenthesization in both
  engines (engine-native corr() implementations use different one-pass
  update formulas and would not hash-match).

Day-part and week bucketing use pure epoch arithmetic on the epoch-ns
`ts` (timezone-proof, same integers in any session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.embeddings import EMB_VALID_ORACLE, load_embeddings
from etl_pipeline_spark.sources.star import load_table

_WEEK_NS = 7 * 24 * 3_600_000_000_000
_HOUR_NS = 3_600_000_000_000


@register(
    "cohort_retention_users",
    oracle=f"""
        WITH firstseen AS (
            SELECT user_id,
                   (epoch_ns(ts) // {_WEEK_NS}) * 604800 AS w0
            FROM (
                SELECT user_id, MIN(ts) AS ts FROM events GROUP BY user_id
            )
        ),
        activity AS (
            SELECT DISTINCT e.user_id, f.w0,
                   (epoch_ns(e.ts) // {_WEEK_NS})
                       - (f.w0 // 604800) AS offset_weeks
            FROM events e JOIN firstseen f USING (user_id)
        )
        SELECT w0 AS cohort_week_epoch, offset_weeks,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM activity GROUP BY 1, 2
    """,
    tags=("analytics", "cohort"),
)
def cohort_retention_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firstseen = ev.groupBy("user_id").agg(
        F.expr(f"(MIN(ts) div {_WEEK_NS}) * 604800").alias("w0")
    )
    activity = (
        ev.join(F.broadcast(firstseen), "user_id")
        .select(
            "user_id",
            "w0",
            (F.expr(f"ts div {_WEEK_NS}") - F.expr("w0 div 604800")).alias(
                "offset_weeks"
            ),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("w0").alias("cohort_week_epoch"), "offset_weeks"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


@register(
    "chisq_event_daypart",
    oracle=f"""
        WITH obs AS (
            SELECT event_type,
                   CAST(((epoch_ns(ts) // {_HOUR_NS}) % 24) // 6 AS INT)
                       AS daypart,
                   CAST(COUNT(*) AS BIGINT) AS obs
            FROM events GROUP BY 1, 2
        ),
        rows_t AS (
            SELECT event_type, CAST(SUM(obs) AS BIGINT) AS row_tot
            FROM obs GROUP BY event_type
        ),
        cols_t AS (
            SELECT daypart, CAST(SUM(obs) AS BIGINT) AS col_tot
            FROM obs GROUP BY daypart
        ),
        tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM obs)
        SELECT o.event_type, o.daypart, o.obs,
               FLOOR((CAST(r.row_tot AS DOUBLE) * c.col_tot / t.n)
                     * 1e6 + 0.5) / 1e6 AS expected,
               FLOOR(((o.obs - CAST(r.row_tot AS DOUBLE) * c.col_tot / t.n)
                      * (o.obs - CAST(r.row_tot AS DOUBLE) * c.col_tot / t.n)
                      / (CAST(r.row_tot AS DOUBLE) * c.col_tot / t.n))
                     * 1e6 + 0.5) / 1e6 AS chi2_contrib
        FROM obs o
        JOIN rows_t r USING (event_type)
        JOIN cols_t c USING (daypart)
        CROSS JOIN tot t
    """,
    tags=("analytics", "stats"),
)
def chisq_event_daypart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell observed/expected/χ²-contribution for event type × day-part.

    The driver sums `chi2_contrib` against the χ² critical value; emitting
    cells (types × 4 rows) keeps the result auditable. Portable half-up
    rounding (see windowed_quantiles) because the expected counts are
    rationals that land on round-tie boundaries.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        F.expr(f"CAST(((ts div {_HOUR_NS}) % 24) div 6 AS INT)").alias("daypart"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    rows_t = obs.groupBy("event_type").agg(
        F.sum("obs").cast("bigint").alias("row_tot")
    )
    cols_t = obs.groupBy("daypart").agg(
        F.sum("obs").cast("bigint").alias("col_tot")
    )
    tot = obs.agg(F.sum("obs").cast("bigint").alias("n"))
    exp = "(CAST(row_tot AS DOUBLE) * col_tot / n)"
    return (
        obs.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "daypart")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "daypart",
            "obs",
            F.expr(f"FLOOR({exp} * 1e6 + 0.5) / 1e6").alias("expected"),
            F.expr(
                f"FLOOR(((obs - {exp}) * (obs - {exp}) / {exp})"
                f" * 1e6 + 0.5) / 1e6"
            ).alias("chi2_contrib"),
        )
    )


def _corr_sql(x: str, y: str) -> str:
    """Pearson r from moment sums, identical text in both engines.
    NULLIF: a zero-variance side (single row, constant column) leaves r
    undefined — NULL, not an ANSI 0-divide (one-row probe, r11)."""
    return (
        f"(SUM({x} * {y}) - SUM({x}) * SUM({y}) / COUNT(*))"
        f" / NULLIF(SQRT(SUM({x} * {x}) - SUM({x}) * SUM({x}) / COUNT(*))"
        f" * SQRT(SUM({y} * {y}) - SUM({y}) * SUM({y}) / COUNT(*)), 0)"
    )


@register(
    "corr_lineitem_moments",
    oracle=f"""
        SELECT
            FLOOR({_corr_sql("CAST(l_quantity AS DOUBLE)", "CAST(l_extendedprice AS DOUBLE)")}
                  * 1e6 + 0.5) / 1e6 AS r_qty_price,
            FLOOR({_corr_sql("CAST(l_discount AS DOUBLE)", "CAST(l_extendedprice AS DOUBLE)")}
                  * 1e6 + 0.5) / 1e6 AS r_discount_price,
            FLOOR({_corr_sql("CAST(l_quantity AS DOUBLE)", "CAST(l_discount AS DOUBLE)")}
                  * 1e6 + 0.5) / 1e6 AS r_qty_discount
        FROM lineitem
    """,
    tags=("analytics", "stats", "narrow"),
)
def corr_lineitem_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "r_qty_price": ("CAST(l_quantity AS DOUBLE)", "CAST(l_extendedprice AS DOUBLE)"),
        "r_discount_price": ("CAST(l_discount AS DOUBLE)", "CAST(l_extendedprice AS DOUBLE)"),
        "r_qty_discount": ("CAST(l_quantity AS DOUBLE)", "CAST(l_discount AS DOUBLE)"),
    }
    return li.agg(
        *[
            F.expr(f"FLOOR({_corr_sql(x, y)} * 1e6 + 0.5) / 1e6").alias(name)
            for name, (x, y) in cols.items()
        ]
    )


# ---------------------------------------------------------------------------
# Embedding-space outliers — distance to the corpus centroid, the cheap
# embedding-quality gate (mis-embedded or off-distribution vectors rank
# first). The centroid is a 64-row per-dimension mean relation, rounded
# to 6 dp BEFORE use so both engines proceed from bit-identical
# centroids (raw double means differ in the last ulps between partial-
# aggregation orders); distances then use the portable floor half-up.
# Plan: one explode + two grouped aggregates + a broadcast join — no
# all-pairs anything, and the final top-k is TakeOrdered.
# ---------------------------------------------------------------------------
@register(
    "embedding_outliers_topk",
    oracle=f"""
        WITH px AS (
            SELECT vec_id, i.i AS pos,
                   CAST(embedding[i.i + 1] AS DOUBLE) AS v
            FROM {EMB_VALID_ORACLE} embeddings,
                 LATERAL (SELECT unnest(generate_series(0, 63)) AS i) i
        ),
        cen AS (
            SELECT pos,
                   FLOOR((SUM(v) / COUNT(*)) * 1e6 + 0.5) / 1e6 AS c
            FROM px GROUP BY pos
        ),
        d AS (
            SELECT px.vec_id,
                   SUM((px.v - cen.c) * (px.v - cen.c)) AS d2
            FROM px JOIN cen USING (pos)
            GROUP BY px.vec_id
        )
        SELECT vec_id,
               FLOOR(SQRT(d2) * 1e6 + 0.5) / 1e6 AS centroid_dist
        FROM d
        ORDER BY centroid_dist DESC, vec_id ASC
        LIMIT 20
    """,
    tags=("llm", "similarity", "quality"),
)
def embedding_outliers_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    px = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "v0")
    ).select("vec_id", "pos", F.col("v0").cast("double").alias("v"))
    cen = px.groupBy("pos").agg(
        F.expr("FLOOR((SUM(v) / COUNT(*)) * 1e6 + 0.5) / 1e6").alias("c")
    )
    d = (
        px.join(F.broadcast(cen), "pos")
        .groupBy("vec_id")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("d2"))
    )
    return (
        d.select(
            "vec_id",
            F.expr("FLOOR(SQRT(d2) * 1e6 + 0.5) / 1e6").alias("centroid_dist"),
        )
        .orderBy(F.desc("centroid_dist"), F.asc("vec_id"))
        .limit(20)
    )
