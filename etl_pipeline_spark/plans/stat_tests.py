"""Round-4 wave-5: classical statistical hypothesis tests and privacy
audits as distributed relational plans.

The inference toolkit a data-platform team runs on event streams and
fact tables (no reference analog — the reference logs row counts, it
cannot test hypotheses; reference: etl/pipeline.py summary logging):

- Kolmogorov–Smirnov two-sample test (Massey 1951) — the supremum gap
  between two empirical CDFs. The ECDFs are cumulative counts over the
  per-distinct-value grouped relation, computed with the same two-level
  distributed scan ``operators/packing.py`` documents: per-value counts
  shuffle once (map-side combined), bucket totals form a SMALL offsets
  relation (one row per ``_KS_BUCKET`` value units), and the intra-
  bucket window runs PARTITION BY bucket — no single-partition global
  window over the data, the plan that cannot run at 100 TB.
- Mann–Whitney U / ROC-AUC (Mann & Whitney 1947) — AUC is the rank-sum
  statistic: for each distinct score, positives above it beat every
  negative below and split ties in half. Same bucketed-scan shape over
  the grouped (score → n_pos, n_neg) relation. U is a sum of exact
  halves (integer·integer + 0.5·integer·integer), so both engines see
  the identical double before the final division.
- One-way ANOVA F (Fisher) — between/within sum-of-squares from one
  map-side-combined moment pass (n, Σx, Σx² per group), the same
  device as ``corr_lineitem_moments``. Only SCALE-FREE statistics are
  emitted (F, η²): raw sums of squares at 100 TB magnitudes carry
  partial-agg-order jitter larger than any fixed decimal rounding,
  while the O(1) ratios' relative jitter is ~1e-12 and rounds stably.
- Mutual information (Shannon) — per-cell PMI and MI contribution for
  order status × priority; the contingency table is |status|×|priority|
  cells, so everything after the first groupBy is tiny and broadcast.
- l-diversity audit (Machanavajjhala et al. 2007) — the companion to
  ``k_anonymity_audit``: per quasi-identifier group, the count AND
  entropy of the sensitive attribute (a group can be k-anonymous yet
  leak everything if all its rows share one sensitive value). Entropy
  uses the single-agg identity  H = ln(Σc) − Σ c·ln(c) / Σc.

Parity: counts exact integers; ratios of integers are IEEE-identical in
both engines; ln/sqrt agree through the 6-dp portable floor rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.embeddings import (
    EMB_LABELED_ORACLE,
    load_embeddings,
    load_labeled_embeddings,
)
from etl_pipeline_spark.sources.star import load_table

# ---------------------------------------------------------------------------
# KS two-sample: purchase vs view event values.
# ---------------------------------------------------------------------------
_KS_BUCKET = 50  # value units per cumulative-scan bucket (offsets
# relation = value_range / _KS_BUCKET rows — bounded by the metric's
# range, not the row count)
_KS_CRIT_05 = 1.358  # c(alpha) for alpha = 0.05


def _two_level_cumsum(
    grouped: DataFrame, order_col: str, bucket_expr: str, sum_cols: list[str]
) -> DataFrame:
    """Inclusive cumulative sums of `sum_cols` in `order_col` order via
    the bucketed two-level scan (see operators/packing.py): adds
    ``cum_<col>`` for each input count column."""
    rows = grouped.withColumn("__b", F.expr(bucket_expr))
    totals = rows.groupBy("__b").agg(
        *[F.sum(c).alias(f"__t_{c}") for c in sum_cols]
    )
    off_w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b",
        *[
            F.coalesce(F.sum(f"__t_{c}").over(off_w), F.lit(0)).alias(f"__o_{c}")
            for c in sum_cols
        ],
    )
    intra_w = (
        Window.partitionBy("__b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = rows.join(F.broadcast(offsets), "__b")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"__o_{c}") + F.sum(c).over(intra_w)
        )
    return out.drop("__b", *[f"__o_{c}" for c in sum_cols])


@register(
    "ks_test_purchase_view",
    oracle=f"""
        WITH s AS (
            SELECT value,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n2
            -- value IS NOT NULL (r11 nulls probe): the ECDF is over
            -- reported values — a NULL value group would lead Spark's
            -- cumulative order and trail DuckDB's, shifting D
            FROM events
            WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
            GROUP BY value
        ),
        t AS (SELECT CAST(SUM(n1) AS BIGINT) AS n1t,
                     CAST(SUM(n2) AS BIGINT) AS n2t FROM s),
        c AS (
            SELECT SUM(n1) OVER w AS c1, SUM(n2) OVER w AS c2
            FROM s
            WINDOW w AS (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        d AS (
            -- NULLIF: an EMPTY sample side (no purchases, or no views, in
            -- a degenerate corpus) leaves both ECDFs — and D — undefined:
            -- NULL, not an ANSI 0-divide (one-row probe, r11)
            SELECT MAX(ABS(CAST(c.c1 AS DOUBLE) / NULLIF(t.n1t, 0)
                           - CAST(c.c2 AS DOUBLE) / NULLIF(t.n2t, 0))) AS ksd
            FROM c CROSS JOIN t
        ),
        r AS (
            SELECT t.n1t, t.n2t,
                   FLOOR(d.ksd * 1e6 + 0.5) / 1e6 AS ks_d
            FROM t CROSS JOIN d
        )
        SELECT n1t AS n_purchase, n2t AS n_view, ks_d,
               FLOOR(ks_d * SQRT(CAST(n1t AS DOUBLE) * n2t / (n1t + n2t))
                     * 1e6 + 0.5) / 1e6 AS ks_scaled,
               CAST(ks_d * SQRT(CAST(n1t AS DOUBLE) * n2t / (n1t + n2t))
                    > {_KS_CRIT_05} AS INT) AS reject_05
        FROM r
    """,
    tags=("stats", "hypothesis-test"),
)
def ks_test_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS two-sample D between purchase and view value distributions."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    )
    s = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    cum = _two_level_cumsum(
        s, "value", f"CAST(FLOOR(value / {_KS_BUCKET}) AS BIGINT)", ["n1", "n2"]
    )
    t = F.broadcast(
        s.agg(
            F.sum("n1").cast("bigint").alias("n1t"),
            F.sum("n2").cast("bigint").alias("n2t"),
        )
    )
    d = (
        cum.crossJoin(t)
        .select(
            # NULLIF mirrors the oracle: an empty sample side leaves D
            # undefined (one-row probe, r11)
            F.expr(
                "ABS(CAST(cum_n1 AS DOUBLE) / NULLIF(n1t, 0)"
                " - CAST(cum_n2 AS DOUBLE) / NULLIF(n2t, 0))"
            ).alias("gap")
        )
        .agg(F.expr("FLOOR(MAX(gap) * 1e6 + 0.5) / 1e6").alias("ks_d"))
    )
    scale = f"SQRT(CAST(n1t AS DOUBLE) * n2t / (n1t + n2t))"
    return (
        t.crossJoin(F.broadcast(d))
        .select(
            F.col("n1t").alias("n_purchase"),
            F.col("n2t").alias("n_view"),
            "ks_d",
            F.expr(f"FLOOR(ks_d * {scale} * 1e6 + 0.5) / 1e6").alias("ks_scaled"),
            F.expr(f"CAST(ks_d * {scale} > {_KS_CRIT_05} AS INT)").alias(
                "reject_05"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mann–Whitney / ROC-AUC: first embedding component as the score,
# label >= 5 as the positive class.
# ---------------------------------------------------------------------------
_AUC_POS_MIN = 5


@register(
    "auc_mann_whitney_embeddings",
    oracle=f"""
        WITH s AS (
            SELECT CAST(embedding[1] AS DOUBLE) AS score,
                   CAST(SUM(CASE WHEN label >= {_AUC_POS_MIN} THEN 1 ELSE 0 END)
                        AS BIGINT) AS np,
                   CAST(SUM(CASE WHEN label >= {_AUC_POS_MIN} THEN 0 ELSE 1 END)
                        AS BIGINT) AS nn
            -- labeled convention (r11 nulls probe): an unlabeled
            -- vector is neither a positive nor a negative
            FROM {EMB_LABELED_ORACLE} embeddings GROUP BY 1
        ),
        c AS (
            SELECT np, nn,
                   COALESCE(SUM(nn) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS nn_below
            FROM s
        ),
        u AS (
            SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
                   CAST(SUM(nn) AS BIGINT) AS n_neg,
                   SUM(np * (CAST(nn_below AS DOUBLE) + 0.5e0 * nn)) AS u_stat
            FROM c
        )
        SELECT n_pos, n_neg,
               FLOOR(u_stat * 10 + 0.5) / 10 AS u_stat,
               -- NULLIF: AUC is undefined when either class is empty —
               -- NULL, not an ANSI 0-divide (probe-found on a truncated
               -- corpus whose labels collapsed to one class)
               FLOOR(u_stat / NULLIF(CAST(n_pos AS DOUBLE) * n_neg, 0.0e0)
                     * 1e6 + 0.5) / 1e6
                   AS auc
        FROM u
    """,
    tags=("stats", "ml-eval", "ranking"),
)
def auc_mann_whitney_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the first embedding component predicting label >= 5.

    U is the Mann–Whitney rank-sum with the tie-split convention; every
    addend is an exact dyadic double (integers and halves), so the sum
    is engine-identical before the one final division.
    """
    emb = load_labeled_embeddings(spark, sf_dir)
    s = emb.groupBy(
        F.expr("CAST(embedding[0] AS DOUBLE)").alias("score")
    ).agg(
        F.sum(F.when(F.col("label") >= _AUC_POS_MIN, 1).otherwise(0))
        .cast("bigint")
        .alias("np"),
        F.sum(F.when(F.col("label") >= _AUC_POS_MIN, 0).otherwise(1))
        .cast("bigint")
        .alias("nn"),
    )
    cum = _two_level_cumsum(
        s, "score", "CAST(FLOOR(score * 20) AS BIGINT)", ["nn"]
    ).withColumn("nn_below", F.col("cum_nn") - F.col("nn"))
    u = cum.agg(
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
        F.expr("SUM(np * (CAST(nn_below AS DOUBLE) + 0.5e0 * nn))").alias("u_raw"),
    )
    return u.select(
        "n_pos",
        "n_neg",
        F.expr("FLOOR(u_raw * 10 + 0.5) / 10").alias("u_stat"),
        F.expr(
            "FLOOR(u_raw / NULLIF(CAST(n_pos AS DOUBLE) * n_neg, 0.0e0)"
            " * 1e6 + 0.5) / 1e6"
        ).alias("auc"),  # single-class corpus -> NULL (see oracle)
    )


# ---------------------------------------------------------------------------
# One-way ANOVA: o_totalprice across order priorities.
# ---------------------------------------------------------------------------
_ANOVA_SSB = "(SUM(s * s / n) - SUM(s) * SUM(s) / SUM(n))"
_ANOVA_SSW = "(SUM(q) - SUM(s * s / n))"


@register(
    "anova_f_totalprice_priority",
    oracle=f"""
        WITH g AS (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(o_totalprice AS DOUBLE)) AS s,
                   SUM(CAST(o_totalprice AS DOUBLE)
                       * CAST(o_totalprice AS DOUBLE)) AS q
            FROM orders GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               -- degenerate dof guard (one-row probe, r11): a single
               -- group (dfb = 0) or n_rows = n_groups (dfw = 0) leaves F
               -- undefined — NULL, not an ANSI 0-divide / fabricated inf
               CASE WHEN COUNT(*) < 2 OR SUM(n) - COUNT(*) <= 0 THEN NULL
                    ELSE FLOOR(({_ANOVA_SSB} / (COUNT(*) - 1))
                               / ({_ANOVA_SSW} / (SUM(n) - COUNT(*)))
                               * 1e6 + 0.5) / 1e6 END AS f_stat,
               CASE WHEN {_ANOVA_SSB} + {_ANOVA_SSW} <= 0 THEN NULL
                    ELSE FLOOR({_ANOVA_SSB} / ({_ANOVA_SSB} + {_ANOVA_SSW})
                               * 1e6 + 0.5) / 1e6 END AS eta_sq
        FROM g
    """,
    tags=("stats", "hypothesis-test", "narrow"),
)
def anova_f_totalprice_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F and effect size η² from per-group moment sums.

    Only the scale-free F and η² are emitted: raw SS magnitudes at
    large scale carry summation-order jitter beyond fixed rounding,
    while the ratios' relative jitter (~1e-12) rounds stably at 6 dp.
    """
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("SUM(CAST(o_totalprice AS DOUBLE))").alias("s"),
        F.expr(
            "SUM(CAST(o_totalprice AS DOUBLE) * CAST(o_totalprice AS DOUBLE))"
        ).alias("q"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("n").cast("bigint").alias("n_rows"),
        # degenerate dof / zero-total-SS guards mirror the oracle (one-row
        # probe, r11): F and eta_sq are NULL where their denominators
        # vanish, never an ANSI 0-divide
        F.expr(
            f"CASE WHEN COUNT(*) < 2 OR SUM(n) - COUNT(*) <= 0 THEN NULL"
            f" ELSE FLOOR(({_ANOVA_SSB} / (COUNT(*) - 1))"
            f" / ({_ANOVA_SSW} / (SUM(n) - COUNT(*)))"
            f" * 1e6 + 0.5) / 1e6 END"
        ).alias("f_stat"),
        F.expr(
            f"CASE WHEN {_ANOVA_SSB} + {_ANOVA_SSW} <= 0 THEN NULL"
            f" ELSE FLOOR({_ANOVA_SSB} / ({_ANOVA_SSB} + {_ANOVA_SSW})"
            f" * 1e6 + 0.5) / 1e6 END"
        ).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# Mutual information: order status × priority, per-cell PMI + MI
# contribution (nats).
# ---------------------------------------------------------------------------
_MI_PMI = (
    "LN((CAST(n_xy AS DOUBLE) * n)"
    " / (CAST(n_x AS DOUBLE) * n_y))"
)


@register(
    "mutual_info_status_priority",
    oracle=f"""
        WITH cells AS (
            SELECT o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_xy
            FROM orders GROUP BY 1, 2
        ),
        mx AS (SELECT o_orderstatus, CAST(SUM(n_xy) AS BIGINT) AS n_x
               FROM cells GROUP BY 1),
        my AS (SELECT o_orderpriority, CAST(SUM(n_xy) AS BIGINT) AS n_y
               FROM cells GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM cells)
        SELECT c.o_orderstatus, c.o_orderpriority, c.n_xy,
               FLOOR({_MI_PMI} * 1e6 + 0.5) / 1e6 AS pmi,
               FLOOR((CAST(n_xy AS DOUBLE) / n) * {_MI_PMI} * 1e6 + 0.5) / 1e6
                   AS mi_contrib
        FROM cells c
        JOIN mx USING (o_orderstatus)
        JOIN my USING (o_orderpriority)
        CROSS JOIN tot
    """,
    tags=("stats", "feature-ranking"),
)
def mutual_info_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell pointwise MI and MI contribution for status × priority.

    The driver sums ``mi_contrib`` for the total MI; emitting cells
    keeps the dependence structure auditable (which cells drive it).
    """
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_xy")
    )
    mx = cells.groupBy("o_orderstatus").agg(
        F.sum("n_xy").cast("bigint").alias("n_x")
    )
    my = cells.groupBy("o_orderpriority").agg(
        F.sum("n_xy").cast("bigint").alias("n_y")
    )
    tot = cells.agg(F.sum("n_xy").cast("bigint").alias("n"))
    return (
        cells.join(F.broadcast(mx), "o_orderstatus")
        .join(F.broadcast(my), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "n_xy",
            F.expr(f"FLOOR({_MI_PMI} * 1e6 + 0.5) / 1e6").alias("pmi"),
            F.expr(
                f"FLOOR((CAST(n_xy AS DOUBLE) / n) * {_MI_PMI}"
                f" * 1e6 + 0.5) / 1e6"
            ).alias("mi_contrib"),
        )
    )


# ---------------------------------------------------------------------------
# l-diversity audit: QI = (priority, order year), sensitive = status.
# ---------------------------------------------------------------------------
_L_DIVERSITY = 3


@register(
    "l_diversity_audit",
    oracle=f"""
        WITH cells AS (
            SELECT o_orderpriority,
                   CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
                   o_orderstatus,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2, 3
        )
        SELECT o_orderpriority, order_year,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS l_distinct,
               FLOOR((LN(SUM(c)) - SUM(c * LN(c)) / SUM(c)) * 1e6 + 0.5) / 1e6
                   AS sens_entropy,
               CAST(COUNT(*) < {_L_DIVERSITY} AS INT) AS is_violation
        FROM cells GROUP BY 1, 2
    """,
    tags=("governance", "privacy", "agg"),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l and entropy-l diversity of order status per QI group.

    Companion to ``k_anonymity_audit``: a group can be k-anonymous yet
    reveal its sensitive attribute when all rows share one value.
    Entropy via the single-agg identity H = ln(Σc) − Σ c·ln(c) / Σc —
    no second pass, no per-group collection.
    """
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        "o_orderpriority",
        F.expr("CAST(EXTRACT(year FROM o_orderdate) AS INT)").alias(
            "order_year"
        ),
        "o_orderstatus",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return cells.groupBy("o_orderpriority", "order_year").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.expr(
            "FLOOR((LN(SUM(c)) - SUM(c * LN(c)) / SUM(c)) * 1e6 + 0.5) / 1e6"
        ).alias("sens_entropy"),
        F.expr(f"CAST(COUNT(*) < {_L_DIVERSITY} AS INT)").alias("is_violation"),
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test — the A/B experiment readout. Cohorts are a
# deterministic hash split (user_id parity, the stratified_kfold
# device); a user "converts" when they log >= _ZT_CONV_MIN purchase
# events (the mean is ~13/user, so the threshold bisects the
# population — a 50/50 proportion is the test's highest-power regime).
# One user-keyed aggregate produces (cohort, converted); everything
# after is a 2-row relation. All inputs to the z formula are exact
# integers; the pooled-variance expression is written with IDENTICAL
# parenthesization in both engines, so every float op is
# IEEE-deterministic (div, mul, sqrt — no libm).
# ---------------------------------------------------------------------------
_ZT_CONV_MIN = 15
_ZT_CRIT_05 = 1.959964

_ZT_Z_DUCK = """
    ((CAST(x_a AS DOUBLE) / n_a) - (CAST(x_b AS DOUBLE) / n_b))
    / SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
           * (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b))
           * (1.0 / n_a + 1.0 / n_b))
"""


@register(
    "ztest_conversion_ab",
    oracle=f"""
        WITH u AS (
            SELECT user_id, user_id % 2 AS cohort,
                   CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                        >= {_ZT_CONV_MIN} AS INT) AS converted
            FROM events GROUP BY 1, 2
        ),
        g AS (
            SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN cohort = 0 THEN converted ELSE 0 END)
                        AS BIGINT) AS x_a,
                   CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b,
                   CAST(SUM(CASE WHEN cohort = 1 THEN converted ELSE 0 END)
                        AS BIGINT) AS x_b
            FROM u
        )
        SELECT n_a, x_a, n_b, x_b,
               CASE WHEN n_a = 0 THEN NULL
                    ELSE ROUND(CAST(x_a AS DOUBLE) / n_a, 6) END AS p_a,
               CASE WHEN n_b = 0 THEN NULL
                    ELSE ROUND(CAST(x_b AS DOUBLE) / n_b, 6) END AS p_b,
               CASE WHEN n_a = 0 OR n_b = 0
                         OR x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN NULL
                    ELSE ROUND({_ZT_Z_DUCK}, 6) END AS z,
               CASE WHEN n_a = 0 OR n_b = 0
                         OR x_a + x_b = 0 OR x_a + x_b = n_a + n_b THEN 0
                    WHEN ABS({_ZT_Z_DUCK}) > {_ZT_CRIT_05} THEN 1
                    ELSE 0 END AS significant
        FROM g
    """,
    tags=("stats", "abtest", "hypothesis"),
)
def ztest_conversion_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id", (F.col("user_id") % 2).alias("cohort")).agg(
        (
            F.count(F.when(F.col("event_type") == "purchase", 1))
            >= _ZT_CONV_MIN
        )
        .cast("int")
        .alias("converted")
    )
    g = u.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("cohort") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("x_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("cohort") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("x_b"),
    )
    # NOTE: pooled p must be computed as (x_a+x_b)/(n_a+n_b) exactly as
    # the oracle writes it — a re-associated form is a DIFFERENT float.
    pooled = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        (F.col("x_a").cast("double") / F.col("n_a"))
        - (F.col("x_b").cast("double") / F.col("n_b"))
    ) / F.sqrt(
        pooled * (1.0 - pooled) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    degenerate = (
        (F.col("n_a") == 0)
        | (F.col("n_b") == 0)
        | (F.col("x_a") + F.col("x_b") == 0)
        | (F.col("x_a") + F.col("x_b") == F.col("n_a") + F.col("n_b"))
    )
    return g.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.when(F.col("n_a") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("x_a").cast("double") / F.col("n_a"), 6))
        .alias("p_a"),
        F.when(F.col("n_b") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.col("x_b").cast("double") / F.col("n_b"), 6))
        .alias("p_b"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(z, 6))
        .alias("z"),
        F.when(degenerate, 0)
        .when(F.abs(z) > _ZT_CRIT_05, 1)
        .otherwise(0)
        .alias("significant"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences — the workhorse causal estimator (Card &
# Krueger 1994 design): treatment = the ztest hash split, period =
# event-time midpoint (min+max)/2 — both deterministic functions of the
# data, no config. DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)
# over purchase values in exact integer cents: each cell mean is one
# IEEE division of exact ints and the estimate is one fixed-parenthesis
# expression — bit-identical in both engines before the 6-dp round.
# One fact scan → 4-cell relation; nothing else shuffles.
# ---------------------------------------------------------------------------
@register(
    "diff_in_diff_purchase",
    oracle="""
        WITH b AS (
            SELECT (SELECT (MIN(epoch_ns(ts)) + MAX(epoch_ns(ts))) // 2
                    FROM events) AS split_ts
        ),
        cells AS (
            SELECT user_id % 2 AS treat,
                   CAST(epoch_ns(ts) >= b.split_ts AS INT) AS post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events CROSS JOIN b
            WHERE event_type = 'purchase'
            GROUP BY 1, 2
        ),
        w AS (
            SELECT
                MIN(CASE WHEN treat = 1 AND post = 1
                         THEN CAST(cents AS DOUBLE) / n END) AS tp,
                MIN(CASE WHEN treat = 1 AND post = 0
                         THEN CAST(cents AS DOUBLE) / n END) AS tr,
                MIN(CASE WHEN treat = 0 AND post = 1
                         THEN CAST(cents AS DOUBLE) / n END) AS cp,
                MIN(CASE WHEN treat = 0 AND post = 0
                         THEN CAST(cents AS DOUBLE) / n END) AS cr,
                CAST(SUM(n) AS BIGINT) AS n_purchases
            FROM cells
        )
        SELECT n_purchases,
               ROUND(tp / 100, 6) AS treat_post_mean,
               ROUND(tr / 100, 6) AS treat_pre_mean,
               ROUND(cp / 100, 6) AS ctrl_post_mean,
               ROUND(cr / 100, 6) AS ctrl_pre_mean,
               ROUND(((tp - tr) - (cp - cr)) / 100, 6) AS did_estimate
        FROM w
    """,
    tags=("stats", "causal", "abtest"),
)
def diff_in_diff_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.expr("(MIN(ts) + MAX(ts)) DIV 2").alias("split_ts")
    )
    cells = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(b))
        .groupBy(
            (F.col("user_id") % 2).alias("treat"),
            (F.col("ts") >= F.col("split_ts")).cast("int").alias("post"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    def _cell(t: int, p: int):
        return F.min(
            F.when(
                (F.col("treat") == t) & (F.col("post") == p),
                F.col("cents").cast("double") / F.col("n"),
            )
        )

    w = cells.agg(
        _cell(1, 1).alias("tp"),
        _cell(1, 0).alias("tr"),
        _cell(0, 1).alias("cp"),
        _cell(0, 0).alias("cr"),
        F.sum("n").cast("bigint").alias("n_purchases"),
    )
    return w.select(
        "n_purchases",
        F.round(F.col("tp") / 100, 6).alias("treat_post_mean"),
        F.round(F.col("tr") / 100, 6).alias("treat_pre_mean"),
        F.round(F.col("cp") / 100, 6).alias("ctrl_post_mean"),
        F.round(F.col("cr") / 100, 6).alias("ctrl_pre_mean"),
        F.round(
            ((F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr"))) / 100,
            6,
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (Deng et al. 2013) — the experimentation-
# platform staple: use each user's PRE-period purchase total as the
# covariate, θ = cov(X, Y)/var(X), and report how much of the outcome
# variance the adjustment removes (var_cuped = var_Y − cov²/var_X).
# Per-user X and Y are exact integer cents (absent period → 0); all
# five moments are exact-int sums; every statistic after is a
# fixed-parenthesis expression of IEEE ops on those exact ints —
# bit-identical in both engines. One user-keyed aggregate → one moment
# row; the same midpoint split as diff_in_diff.
# ---------------------------------------------------------------------------
_CUPED_STATS_DUCK = """
    CAST(sxy AS DOUBLE) / n - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)
"""


@register(
    "cuped_variance_reduction",
    oracle=f"""
        WITH b AS (
            SELECT (SELECT (MIN(epoch_ns(ts)) + MAX(epoch_ns(ts))) // 2
                    FROM events) AS split_ts
        ),
        u AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                  AND epoch_ns(ts) < b.split_ts
                                 THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                  AND epoch_ns(ts) >= b.split_ts
                                 THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS y
            FROM events CROSS JOIN b
            GROUP BY 1
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(MIN(x) = MAX(x) AS INT) AS x_const,
                   CAST(MIN(y) = MAX(y) AS INT) AS y_const
            FROM u
        )
        SELECT n AS n_users,
               -- + 0.0e0 on the signed outputs normalizes IEEE -0.0 (the
               -- crosscorr bug-42 class: zero covariance reaches the
               -- round as engine-dependent ±1e-18)
               CASE WHEN x_const = 1 THEN NULL ELSE
               ROUND(({_CUPED_STATS_DUCK})
                     / (CAST(sxx AS DOUBLE) / n
                        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)),
                     6) + 0.0e0 END AS theta,
               ROUND((CAST(syy AS DOUBLE) / n
                      - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                     / 10000, 6) AS var_y,
               CASE WHEN x_const = 1 THEN NULL ELSE
               ROUND(((CAST(syy AS DOUBLE) / n
                       - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                      - ({_CUPED_STATS_DUCK}) * ({_CUPED_STATS_DUCK})
                        / (CAST(sxx AS DOUBLE) / n
                           - (CAST(sx AS DOUBLE) / n)
                             * (CAST(sx AS DOUBLE) / n)))
                     / 10000, 6) + 0.0e0 END AS var_cuped,
               CASE WHEN x_const = 1 OR y_const = 1 THEN NULL ELSE
               ROUND((({_CUPED_STATS_DUCK}) * ({_CUPED_STATS_DUCK})
                      / (CAST(sxx AS DOUBLE) / n
                         - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
                     / (CAST(syy AS DOUBLE) / n
                        - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)),
                     6) END AS variance_reduction
        FROM mom
    """,
    tags=("stats", "abtest", "variance-reduction"),
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.expr("(MIN(ts) + MAX(ts)) DIV 2").alias("split_ts")
    )
    cents = F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") < F.col("split_ts")),
                    cents,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("split_ts")),
                    cents,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("y"),
        )
    )
    mom = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        # exact degenerate-variance flags (an int MIN=MAX identity —
        # the float var expression lands on ±epsilon, not 0)
        (F.min("x") == F.max("x")).cast("int").alias("x_const"),
        (F.min("y") == F.max("y")).cast("int").alias("y_const"),
    )
    cov = F.expr(_CUPED_STATS_DUCK.replace("\n", " "))
    var_x = F.expr(
        "CAST(sxx AS DOUBLE) / n"
        " - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)"
    )
    var_y = F.expr(
        "CAST(syy AS DOUBLE) / n"
        " - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)"
    )
    null_d = F.lit(None).cast("double")
    x_const = F.col("x_const") == 1
    y_const = F.col("y_const") == 1
    return mom.select(
        F.col("n").alias("n_users"),
        # + 0.0 normalizes -0.0 on the signed outputs (bug-42 class)
        F.when(x_const, null_d)
        .otherwise(F.round(cov / var_x, 6) + F.lit(0.0))
        .alias("theta"),
        F.round(var_y / 10000, 6).alias("var_y"),
        F.when(x_const, null_d)
        .otherwise(F.round((var_y - cov * cov / var_x) / 10000, 6) + F.lit(0.0))
        .alias("var_cuped"),
        F.when(x_const | y_const, null_d)
        .otherwise(F.round((cov * cov / var_x) / var_y, 6))
        .alias("variance_reduction"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit (Li, Li & Venkatasubramanian 2007) — completes the
# release-gate trio with k_anonymity_audit and l_diversity_audit: a
# group can be k-anonymous AND l-diverse while its sensitive-value
# DISTRIBUTION still leaks (e.g. 90/10 where the population is 50/50).
# For the nominal sensitive attribute the EMD reduces to total
# variation distance t = ½ Σ_s |p_group(s) − p_global(s)|. The status
# domain joins in as a cross product of two TINY relations (QI groups ×
# statuses — missing cells must contribute |0 − q| rather than vanish);
# all probabilities are exact-int ratios; the violation flag compares
# the ROUNDED t so a 1-ulp summation difference can never flip it.
# ---------------------------------------------------------------------------
_T_CLOSENESS = 0.2


@register(
    "t_closeness_audit",
    oracle=f"""
        WITH cells AS (
            SELECT o_orderpriority,
                   CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
                   o_orderstatus,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM orders GROUP BY 1, 2, 3
        ),
        grp AS (
            SELECT o_orderpriority, order_year, CAST(SUM(c) AS BIGINT) AS ng
            FROM cells GROUP BY 1, 2
        ),
        gdist AS (
            SELECT o_orderstatus, CAST(SUM(c) AS BIGINT) AS cs FROM cells
            GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells),
        dom AS (
            SELECT g.o_orderpriority, g.order_year, g.ng,
                   s.o_orderstatus, s.cs, t.n
            FROM grp g CROSS JOIN gdist s CROSS JOIN tot t
        ),
        d AS (
            SELECT dom.o_orderpriority, dom.order_year, dom.ng,
                   ABS(CAST(COALESCE(cells.c, 0) AS DOUBLE) / dom.ng
                       - CAST(dom.cs AS DOUBLE) / dom.n) AS gap
            FROM dom LEFT JOIN cells
              ON cells.o_orderpriority = dom.o_orderpriority
             AND cells.order_year = dom.order_year
             AND cells.o_orderstatus = dom.o_orderstatus
        )
        SELECT o_orderpriority, order_year, ng AS group_size,
               ROUND(0.5 * SUM(gap), 6) AS t_distance,
               CAST(ROUND(0.5 * SUM(gap), 6) > {_T_CLOSENESS} AS INT)
                   AS is_violation
        FROM d GROUP BY 1, 2, 3
    """,
    tags=("privacy", "audit", "stats"),
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        "o_orderpriority",
        F.expr("CAST(EXTRACT(year FROM o_orderdate) AS INT)").alias(
            "order_year"
        ),
        "o_orderstatus",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    grp = cells.groupBy("o_orderpriority", "order_year").agg(
        F.sum("c").cast("bigint").alias("ng")
    )
    glob = cells.groupBy("o_orderstatus").agg(
        F.sum("c").cast("bigint").alias("cs")
    )
    tot = cells.agg(F.sum("c").cast("bigint").alias("n"))
    dom = grp.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(tot))
    d = dom.join(
        cells, ["o_orderpriority", "order_year", "o_orderstatus"], "left"
    ).select(
        "o_orderpriority",
        "order_year",
        "ng",
        F.abs(
            F.coalesce(F.col("c"), F.lit(0)).cast("double") / F.col("ng")
            - F.col("cs").cast("double") / F.col("n")
        ).alias("gap"),
    )
    t_r = F.round(0.5 * F.sum("gap"), 6)
    return d.groupBy("o_orderpriority", "order_year", "ng").agg(
        t_r.alias("t_distance"),
        (t_r > _T_CLOSENESS).cast("int").alias("is_violation"),
    ).select(
        "o_orderpriority",
        "order_year",
        F.col("ng").alias("group_size"),
        "t_distance",
        "is_violation",
    )


# ---------------------------------------------------------------------------
# Differentially-private noisy counts (round-6 wave): the Laplace
# mechanism (Dwork et al. 2006) on per-type event counts — sensitivity 1
# count query, ε = 0.1, noise ~ Laplace(b = 1/ε = 10) drawn via inverse
# CDF from a DETERMINISTIC uniform (the md5 instr-decode of
# operators/sampling.py — evaluates identically in both engines, so the
# "random" release is oracle-checkable). u centers on (u32+0.5)/2³² so
# neither ln() argument can hit 0. Completes the governance family
# (k-anonymity, l-diversity, t-closeness) with its release mechanism;
# output keeps the true count beside the noisy one because this
# registers the MECHANISM, not an actual private release.
# ---------------------------------------------------------------------------
from etl_pipeline_spark.operators.sampling import hash_u32_sql as _hash_u32_sql

_DP_B = 10.0  # Laplace scale = sensitivity / epsilon = 1 / 0.1


def _dp_noise_sql(u32: str) -> str:
    # e0 literals: a bare 0.5 keeps Spark in DECIMAL arithmetic through
    # the /2^32 division (truncated at decimal scale ~13) while DuckDB
    # computes exact doubles — the PSI drift class. (n+0.5)/2^32 is exact
    # in double (dyadic, < 2^53).
    u = f"(({u32}) + 0.5e0) / 4294967296.0e0"
    return (
        f"CASE WHEN {u} < 0.5 THEN {_DP_B} * LN(2.0 * ({u}))"
        f" ELSE -{_DP_B} * LN(2.0 * (1.0 - ({u}))) END"
    )


@register(
    "dp_noisy_counts_laplace",
    oracle=f"""
        WITH c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
            FROM events GROUP BY 1
        )
        SELECT event_type, n_true,
               ROUND({_dp_noise_sql(_hash_u32_sql("event_type", "dp"))}, 4)
                   AS noise,
               ROUND(n_true + {_dp_noise_sql(_hash_u32_sql("event_type", "dp"))},
                     4) AS n_noisy
        FROM c
    """,
    tags=("privacy", "governance", "dp"),
)
def dp_noisy_counts_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    noise = _dp_noise_sql(_hash_u32_sql("event_type", "dp"))
    return c.select(
        "event_type",
        "n_true",
        F.round(F.expr(noise), 4).alias("noise"),
        F.round(F.col("n_true") + F.expr(noise), 4).alias("n_noisy"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-nation conversion tests (round-6
# wave; Benjamini & Hochberg 1995): each nation's user conversion rate
# is z-tested against the rest (two-proportion, pooled variance — the
# ztest_conversion_ab statistic per segment), p-values come from the
# Abramowitz-Stegun 26.2.17 normal-tail polynomial (identical Horner
# nesting in both engines; EXP is the only libm call and the p rounds
# at 6 dp), and the BH step-up procedure marks which nations survive at
# q = 0.10 — the multiple-testing discipline any per-segment alarm
# sheet needs before anyone acts on "segment X moved".
#
# Float parity: z is built ONLY from +,-,*,/,sqrt on exact integer
# ratios — all correctly-rounded IEEE ops, so z is bit-identical across
# engines before its 6-dp display round. BH compares the ROUNDED
# p (both engines see the same 6-dp value) against q*i/m, with rank
# ties broken by nation name.
#
# Scale shape: one fact pass to per-user flags, one user->customer
# equi-join (both volume-linear), then everything runs on the
# 25-nation domain; the BH rank/step-up windows are nation-domain-sized.
# ---------------------------------------------------------------------------
_BH_Q = 0.10
# Abramowitz-Stegun 26.2.17: Q(x) = phi(x)*(b1 t + ... + b5 t^5),
# t = 1/(1 + 0.2316419 x); two-sided p = 2 Q(|z|)
_AS_P_SQL = (
    "2.0 * 0.3989422804014327 * EXP(-az * az / 2.0)"
    " * (t * (0.319381530 + t * (-0.356563782 + t * (1.781477937"
    " + t * (-1.821255978 + t * 1.330274429)))))"
)


@register(
    "bh_fdr_nation_conversion",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                        >= {_ZT_CONV_MIN} AS INT) AS conv
            FROM events GROUP BY 1
        ),
        g AS (
            SELECT n.n_name,
                   CAST(COUNT(*) AS BIGINT) AS n_i,
                   CAST(SUM(u.conv) AS BIGINT) AS x_i
            FROM u
            JOIN customer c ON c.c_custkey = u.user_id
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
                   CAST(SUM(x_i) AS BIGINT) AS xx
            FROM g
        ),
        z AS (
            SELECT g.n_name, g.n_i, g.x_i,
                   (CAST(g.x_i AS DOUBLE) / g.n_i
                    - CAST(t.xx - g.x_i AS DOUBLE) / (t.nn - g.n_i))
                   / SQRT((CAST(t.xx AS DOUBLE) / t.nn)
                          * (1.0 - CAST(t.xx AS DOUBLE) / t.nn)
                          * (1.0 / g.n_i + 1.0 / (t.nn - g.n_i))) AS zv
            FROM g CROSS JOIN tot t
            WHERE t.nn - g.n_i > 0 AND t.xx > 0 AND t.xx < t.nn
        ),
        p AS (
            SELECT n_name, n_i, x_i, zv,
                   ROUND({_AS_P_SQL}, 6) AS p_r
            FROM (SELECT *, ABS(zv) AS az,
                         1.0 / (1.0 + 0.2316419 * ABS(zv)) AS t
                  FROM z)
        ),
        r AS (
            SELECT *,
                   ROW_NUMBER() OVER (ORDER BY p_r ASC, n_name ASC) AS rnk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM p
        )
        SELECT n_name,
               n_i AS n_users, x_i AS n_converted,
               ROUND(zv, 6) AS z, p_r AS p_value,
               CAST(rnk AS BIGINT) AS bh_rank,
               CAST(MAX(CASE WHEN p_r <= {_BH_Q} * rnk / m
                             THEN 1 ELSE 0 END)
                    OVER (ORDER BY rnk DESC) AS INT) AS bh_reject
        FROM r
    """,
    tags=("stats", "hypothesis", "governance"),
)
def bh_fdr_nation_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    u = ev.groupBy("user_id").agg(
        (F.count(F.when(F.col("event_type") == "purchase", 1)) >= _ZT_CONV_MIN)
        .cast("int")
        .alias("conv")
    )
    g = (
        u.join(cust, u.user_id == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum("conv").cast("bigint").alias("x_i"),
        )
    )
    tot = g.agg(
        F.sum("n_i").cast("bigint").alias("nn"),
        F.sum("x_i").cast("bigint").alias("xx"),
    )
    pooled = F.col("xx").cast("double") / F.col("nn")
    zv = (
        F.col("x_i").cast("double") / F.col("n_i")
        - (F.col("xx") - F.col("x_i")).cast("double")
        / (F.col("nn") - F.col("n_i"))
    ) / F.sqrt(
        pooled
        * (1.0 - pooled)
        * (1.0 / F.col("n_i") + 1.0 / (F.col("nn") - F.col("n_i")))
    )
    z = (
        g.crossJoin(F.broadcast(tot))  # one-row total side
        .where(
            (F.col("nn") - F.col("n_i") > 0)
            & (F.col("xx") > 0)
            & (F.col("xx") < F.col("nn"))
        )
        .select("n_name", "n_i", "x_i", zv.alias("zv"))
    )
    p = z.select(
        "n_name",
        "n_i",
        "x_i",
        "zv",
        F.abs(F.col("zv")).alias("az"),
        (1.0 / (1.0 + 0.2316419 * F.abs(F.col("zv")))).alias("t"),
    ).select(
        "n_name", "n_i", "x_i", "zv", F.round(F.expr(_AS_P_SQL), 6).alias("p_r")
    )
    # nation-domain windows (<= 25 rows): rank, then the BH step-up as a
    # reverse running MAX so any rank below a passing one also rejects
    w_rank = Window.orderBy(F.col("p_r").asc(), F.col("n_name").asc())
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = p.select(
        "n_name",
        "n_i",
        "x_i",
        "zv",
        "p_r",
        F.row_number().over(w_rank).alias("rnk"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("m"),
    )
    w_rev = Window.orderBy(F.col("rnk").desc())
    return r.select(
        "n_name",
        F.col("n_i").alias("n_users"),
        F.col("x_i").alias("n_converted"),
        F.round("zv", 6).alias("z"),
        F.col("p_r").alias("p_value"),
        F.col("rnk").cast("bigint").alias("bh_rank"),
        F.max(
            F.when(F.col("p_r") <= _BH_Q * F.col("rnk") / F.col("m"), 1)
            .otherwise(0)
        )
        .over(w_rev)
        .cast("int")
        .alias("bh_reject"),
    )


# ---------------------------------------------------------------------------
# Differentially-private top-k via the exponential mechanism (McSherry &
# Talwar 2007) with the Gumbel-max trick: adding Gumbel(2*du/eps) noise
# to each utility and taking the top k EXACTLY samples the mechanism
# without replacement. Utility = event-type count (sensitivity 1),
# eps = 0.1, k = 3. The Gumbel draw -ln(-ln(u)) uses the deterministic
# md5 uniform (operators/sampling.py) so the "random" release is
# oracle-checkable — same pattern as dp_noisy_counts_laplace; ranking
# compares 6-dp-ROUNDED scores (tie-break: type name) so cross-libm
# ln() jitter cannot flip an ordering. Completes the DP pair: Laplace
# for releases of VALUES, exponential mechanism for releases of CHOICES.
# ---------------------------------------------------------------------------
_DPE_EPS = 0.1
_DPE_K = 3


def _dpe_score_sql() -> str:
    u = f"(({_hash_u32_sql('event_type', 'dpexp')}) + 0.5e0) / 4294967296.0e0"
    # Gumbel-max: argmax of  u(x)*eps/(2*du) + standard Gumbel  samples
    # P(x) proportional to exp(eps*u/(2*du)); e0 keeps both engines in
    # double for the score (decimal-drift lint)
    return f"n_true * {_DPE_EPS}e0 / 2.0e0 + (-LN(-LN({u})))"


@register(
    "dp_exponential_topk",
    oracle=f"""
        WITH c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT event_type, n_true,
                   ROUND({_dpe_score_sql()}, 6) AS score
            FROM c
        )
        -- NULLS LAST tiebreak (r11 nulls probe): the NULL-type group now
        -- scores via the hash sentinel; on an exact score tie its rank
        -- must not depend on the engines' default NULL order
        SELECT event_type, n_true, score,
               CAST(ROW_NUMBER() OVER (
                    ORDER BY score DESC, event_type ASC NULLS LAST)
                    AS BIGINT) AS rank,
               CAST(ROW_NUMBER() OVER (
                    ORDER BY score DESC, event_type ASC NULLS LAST)
                    <= {_DPE_K} AS INT) AS selected
        FROM s
    """,
    tags=("privacy", "governance", "dp"),
)
def dp_exponential_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    s = c.select(
        "event_type",
        "n_true",
        F.round(F.expr(_dpe_score_sql()), 6).alias("score"),
    )
    w = Window.orderBy(F.col("score").desc(), F.asc_nulls_last("event_type"))
    return s.select(
        "event_type",
        "n_true",
        "score",
        F.row_number().over(w).cast("bigint").alias("rank"),
        (F.row_number().over(w) <= _DPE_K).cast("int").alias("selected"),
    )


# ---------------------------------------------------------------------------
# Kendall's tau-b between daily view counts and daily purchase revenue
# (Kendall 1938; the rank-correlation companion to spearman_corr_daily
# that prices ties correctly): concordant/discordant over all day pairs
# with the tie-corrected denominator sqrt((n0 - Tx)(n0 - Ty)). The day
# domain is bounded (~30 rows -> ~435 pairs at any fact volume), so the
# pair self-join is domain-sized; everything is exact integers until
# the final sqrt, rounded at 6 dp.
# ---------------------------------------------------------------------------
@register(
    "kendall_tau_daily",
    oracle=f"""
        WITH daily AS (
            SELECT epoch_ns(ts) // {86_400_000_000_000} AS day,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS v,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS r
            FROM events GROUP BY 1
        ),
        p AS (
            SELECT CAST(SUM(CASE WHEN (a.v - b.v) * (a.r - b.r) > 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN (a.v - b.v) * (a.r - b.r) < 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS d,
                   CAST(SUM(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS BIGINT)
                       AS tx,
                   CAST(SUM(CASE WHEN a.r = b.r THEN 1 ELSE 0 END) AS BIGINT)
                       AS ty,
                   CAST(COUNT(*) AS BIGINT) AS n0
            FROM daily a JOIN daily b ON a.day < b.day
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily)
        SELECT n.nd AS n_days, p.c AS concordant, p.d AS discordant,
               CASE WHEN p.n0 - p.tx = 0 OR p.n0 - p.ty = 0 THEN NULL
                    ELSE ROUND((p.c - p.d) * 1.0
                               / SQRT(CAST((p.n0 - p.tx) AS DOUBLE)
                                      * (p.n0 - p.ty)), 6) END AS tau_b
        FROM p CROSS JOIN n
    """,
    tags=("stats", "correlation", "events"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("ts DIV 86400000000000").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("bigint")
        .alias("v"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("r"),
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("v").alias("va"), F.col("r").alias("ra")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("v").alias("vb"), F.col("r").alias("rb")
    )
    # day-DOMAIN pair join (~435 pairs at any volume); b side broadcast
    prod = (F.col("va") - F.col("vb")) * (F.col("ra") - F.col("rb"))
    p = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint").alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint").alias("d"),
            F.sum(F.when(F.col("va") == F.col("vb"), 1).otherwise(0))
            .cast("bigint")
            .alias("tx"),
            F.sum(F.when(F.col("ra") == F.col("rb"), 1).otherwise(0))
            .cast("bigint")
            .alias("ty"),
            F.count(F.lit(1)).cast("bigint").alias("n0"),
        )
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    tau = (F.col("c") - F.col("d")) * 1.0 / F.sqrt(
        (F.col("n0") - F.col("tx")).cast("double") * (F.col("n0") - F.col("ty"))
    )
    return p.crossJoin(F.broadcast(n)).select(  # one-row count side
        F.col("nd").alias("n_days"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.when(
            (F.col("n0") - F.col("tx") == 0) | (F.col("n0") - F.col("ty") == 0),
            F.lit(None),
        )
        .otherwise(F.round(tau, 6))
        .alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Cramer's V association strength for two categorical pairs
# (Cramer 1946) — the effect-size companion to the chi-square tests:
# V = sqrt(chi2 / (n * min(r-1, c-1))) in [0, 1], comparable ACROSS
# tables where raw chi2 is not. Cells, margins and n are one grouped
# count per pair; chi2 = sum (obs - exp)^2 / exp over the cell domain.
# ---------------------------------------------------------------------------
def _cramers_cte(pair: str, table: str, ca: str, cb: str) -> str:
    return f"""
        SELECT '{pair}' AS pair,
               CAST(SUM(n_cell) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS c,
               SUM(POWER(n_cell - rt * ct / tot, 2) / (rt * ct / tot))
                   AS chi2
        FROM (
            SELECT a, b, n_cell,
                   SUM(n_cell) OVER (PARTITION BY a) * 1.0 AS rt,
                   SUM(n_cell) OVER (PARTITION BY b) * 1.0 AS ct,
                   SUM(n_cell) OVER () * 1.0 AS tot
            FROM (
                SELECT {ca} AS a, {cb} AS b,
                       CAST(COUNT(*) AS BIGINT) AS n_cell
                FROM {table} GROUP BY 1, 2
            )
        )"""
        # ungrouped on purpose: an EMPTY table still yields the pair row
        # (n NULL, r = c = 0), matching Spark's ungrouped agg — GROUP BY
        # over the constant emitted zero rows there (empty-input probe)


@register(
    "cramers_v_pairs",
    oracle=f"""
        WITH u AS (
            {_cramers_cte("status_x_priority", "orders",
                          "o_orderstatus", "o_orderpriority")}
            UNION ALL
            {_cramers_cte("returnflag_x_linestatus", "lineitem",
                          "l_returnflag", "l_linestatus")}
        )
        SELECT pair, n, r, c,
               CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
               ROUND(chi2, 6) AS chi2,
               CASE WHEN r < 2 OR c < 2 THEN NULL
                    ELSE ROUND(SQRT(chi2 / (n * LEAST(r - 1, c - 1))), 6)
               END AS cramers_v
        FROM u
    """,
    tags=("stats", "association", "categorical"),
)
def cramers_v_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    def one(pair: str, table: str, ca: str, cb: str) -> DataFrame:
        t = load_table(spark, sf_dir, table).select(
            F.col(ca).alias("a"), F.col(cb).alias("b")
        )
        cells = t.groupBy("a", "b").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cell")
        )
        # margins as windows over the CELL domain (r x c rows)
        wr = Window.partitionBy("a")
        wc = Window.partitionBy("b")
        wt = Window.partitionBy()
        m = cells.select(
            "a",
            "b",
            "n_cell",
            (F.sum("n_cell").over(wr) * 1.0).alias("rt"),
            (F.sum("n_cell").over(wc) * 1.0).alias("ct"),
            (F.sum("n_cell").over(wt) * 1.0).alias("tot"),
        )
        exp = F.col("rt") * F.col("ct") / F.col("tot")
        return m.agg(
            F.lit(pair).alias("pair"),
            F.sum("n_cell").cast("bigint").alias("n"),
            F.countDistinct("a").cast("bigint").alias("r"),
            F.countDistinct("b").cast("bigint").alias("c"),
            F.sum(F.pow(F.col("n_cell") - exp, 2) / exp).alias("chi2"),
        )

    u = one("status_x_priority", "orders", "o_orderstatus", "o_orderpriority").unionByName(
        one("returnflag_x_linestatus", "lineitem", "l_returnflag", "l_linestatus")
    )
    v = F.when(
        (F.col("r") < 2) | (F.col("c") < 2), F.lit(None)
    ).otherwise(
        F.round(
            F.sqrt(
                F.col("chi2") / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        )
    )
    return u.select(
        "pair",
        "n",
        "r",
        "c",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        v.alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Gumbel block-maxima fit (extreme-value theory; Gumbel 1958) on weekly
# maxima of daily purchase revenue, by method of moments:
# beta = s * sqrt(6) / pi, mu = xbar - gamma * beta (gamma = Euler-
# Mascheroni), plus the T-block return level mu - beta * ln(-ln(1-1/T))
# for T = 4 blocks — "what weekly-peak daily revenue do we exceed once
# a month?". Two grouped aggregates (day, then ISO-week block) and a
# one-row moment finish; constants are spelled as literals so both
# engines use the identical doubles. Sample std uses the fixed-
# parenthesis moment form; < 2 blocks or zero variance -> NULL fit.
# ---------------------------------------------------------------------------
_EVT_T = 4.0
_GAMMA_EM = 0.5772156649015329
_SQRT6_OVER_PI = 0.7796968012336793  # sqrt(6)/pi


@register(
    "gumbel_weekly_max_revenue",
    oracle=f"""
        WITH daily AS (
            SELECT epoch_ns(ts) // {86_400_000_000_000} AS day,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        blocks AS (
            SELECT day // 7 AS wk, CAST(MAX(cents) AS BIGINT) AS mx
            FROM daily GROUP BY 1
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(mx AS DOUBLE) / 100.0) AS s1,
                   SUM((CAST(mx AS DOUBLE) / 100.0)
                       * (CAST(mx AS DOUBLE) / 100.0)) AS s2
            FROM blocks
        ),
        fit AS (
            SELECT n,
                   s1 / n AS xbar,
                   CASE WHEN n < 2 OR s2 / n - (s1 / n) * (s1 / n) <= 0
                        THEN NULL
                        ELSE SQRT((s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1))
                             * {_SQRT6_OVER_PI} END AS beta
            FROM m
        )
        SELECT n AS n_blocks, ROUND(xbar, 6) AS block_max_mean,
               ROUND(beta, 6) AS gumbel_beta,
               ROUND(xbar - {_GAMMA_EM} * beta, 6) AS gumbel_mu,
               ROUND(xbar - {_GAMMA_EM} * beta
                     - beta * LN(-LN(1.0 - 1.0 / {_EVT_T})), 6)
                   AS return_level_4
        FROM fit
    """,
    tags=("stats", "extremes", "timeseries"),
)
def gumbel_weekly_max_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.expr("ts DIV 86400000000000").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
        .cast("bigint")
        .alias("cents")
    )
    blocks = daily.groupBy(F.expr("day DIV 7").alias("wk")).agg(
        F.max("cents").cast("bigint").alias("mx")
    )
    x = F.col("mx").cast("double") / 100.0
    m = blocks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    var = s2 / n - (s1 / n) * (s1 / n)
    fit = m.select(
        "n",
        (s1 / n).alias("xbar"),
        F.when((n < 2) | (var <= 0), F.lit(None))
        .otherwise(F.sqrt(var * n / (n - 1)) * _SQRT6_OVER_PI)
        .alias("beta"),
    )
    mu = F.col("xbar") - _GAMMA_EM * F.col("beta")
    rl = mu - F.col("beta") * F.log(-F.log(F.lit(1.0) - 1.0 / _EVT_T))
    return fit.select(
        F.col("n").alias("n_blocks"),
        F.round("xbar", 6).alias("block_max_mean"),
        F.round("beta", 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(rl, 6).alias("return_level_4"),
    )


# ---------------------------------------------------------------------------
# Lincoln-Petersen capture-recapture (Petersen 1896; Chapman's
# bias-corrected form): estimate the TOTAL user population from two
# "capture occasions" — users active in the first half vs second half of
# the observation window. N_hat = (n1+1)(n2+1)/(m+1) - 1, with the
# standard variance for a Wald 95% interval. The estimator every
# dedup/coverage audit reaches for when the union is unobservable; here
# it is oracle-checkable because both occasions are defined by epoch
# arithmetic. One user-keyed aggregate -> three counts.
# ---------------------------------------------------------------------------
@register(
    "capture_recapture_users",
    oracle="""
        WITH mid AS (
            SELECT (MIN(epoch_ns(ts)) + MAX(epoch_ns(ts))) // 2 AS m
            FROM events
        ),
        u AS (
            SELECT user_id,
                   CAST(MAX(CASE WHEN epoch_ns(ts) < mid.m THEN 1 ELSE 0 END)
                        AS INT) AS c1,
                   CAST(MAX(CASE WHEN epoch_ns(ts) >= mid.m THEN 1 ELSE 0 END)
                        AS INT) AS c2
            FROM events CROSS JOIN mid GROUP BY 1
        ),
        k AS (
            SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                   CAST(SUM(c2) AS BIGINT) AS n2,
                   CAST(SUM(c1 * c2) AS BIGINT) AS m,
                   CAST(COUNT(*) AS BIGINT) AS n_true
            FROM u
        )
        SELECT n1, n2, m, n_true,
               ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 6)
                   AS n_chapman,
               ROUND(SQRT((n1 + 1.0) * (n2 + 1.0) * (n1 - m * 1.0)
                          * (n2 - m * 1.0)
                          / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 6)
                   AS se_chapman
        FROM k
    """,
    tags=("stats", "estimation", "governance"),
)
def capture_recapture_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    mid = ev.agg(
        F.expr("(MIN(ts) + MAX(ts)) DIV 2").alias("m")
    )
    u = (
        ev.crossJoin(F.broadcast(mid))  # one-row midpoint side
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("ts") < F.col("m"), 1).otherwise(0))
            .cast("int")
            .alias("c1"),
            F.max(F.when(F.col("ts") >= F.col("m"), 1).otherwise(0))
            .cast("int")
            .alias("c2"),
        )
    )
    k = u.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
    )
    n1, n2, mm = F.col("n1"), F.col("n2"), F.col("m")
    nhat = (n1 + 1.0) * (n2 + 1.0) / (mm + 1.0) - 1.0
    se = F.sqrt(
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - mm * 1.0)
        * (n2 - mm * 1.0)
        / ((mm + 1.0) * (mm + 1.0) * (mm + 2.0))
    )
    return k.select(
        "n1",
        "n2",
        "m",
        "n_true",
        F.round(nhat, 6).alias("n_chapman"),
        F.round(se, 6).alias("se_chapman"),
    )


# ---------------------------------------------------------------------------
# Negative-binomial overdispersion of purchases-per-user (the canonical
# count-model screen: Poisson assumes var = mean; real user behavior is
# overdispersed). Method-of-moments NB fit: r = mean^2/(var - mean),
# p = mean/var, plus the variance-to-mean ratio (index of dispersion).
# One user-keyed count -> one moment row; var <= mean -> NULL fit (the
# data is UNDER-dispersed and NB degenerate).
# ---------------------------------------------------------------------------
@register(
    "nb_overdispersion_purchases",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                            END) AS BIGINT) AS k
            FROM events GROUP BY 1
        ),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS s1,
                   CAST(SUM(k * k) AS BIGINT) AS s2
            FROM u
        )
        -- degenerate guards (one-row probe, r11): a single user leaves
        -- the SAMPLE variance (n−1 denominator) undefined, and a zero
        -- purchase mean leaves the dispersion ratio undefined — NULL in
        -- both engines, never an ANSI 0-divide. Guards are ORDERED so the
        -- variance expression is never evaluated at n < 2.
        SELECT n AS n_users,
               ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_purchases,
               CASE WHEN n < 2 THEN NULL
                    ELSE ROUND((CAST(s2 AS DOUBLE) / n
                                - (CAST(s1 AS DOUBLE) / n)
                                  * (CAST(s1 AS DOUBLE) / n))
                               * n / (n - 1), 6) END AS var_purchases,
               CASE WHEN n < 2 OR s1 = 0 THEN NULL
                    ELSE ROUND(((CAST(s2 AS DOUBLE) / n
                                 - (CAST(s1 AS DOUBLE) / n)
                                   * (CAST(s1 AS DOUBLE) / n))
                                * n / (n - 1)) / (CAST(s1 AS DOUBLE) / n), 6)
               END AS dispersion_index,
               CASE WHEN n < 2 THEN NULL
                    WHEN (CAST(s2 AS DOUBLE) / n
                          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                         * n / (n - 1) <= CAST(s1 AS DOUBLE) / n THEN NULL
                    ELSE ROUND((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                               / ((CAST(s2 AS DOUBLE) / n
                                   - (CAST(s1 AS DOUBLE) / n)
                                     * (CAST(s1 AS DOUBLE) / n)) * n / (n - 1)
                                  - CAST(s1 AS DOUBLE) / n), 6) END AS nb_r,
               CASE WHEN n < 2 THEN NULL
                    WHEN (CAST(s2 AS DOUBLE) / n
                          - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                         * n / (n - 1) <= CAST(s1 AS DOUBLE) / n THEN NULL
                    ELSE ROUND((CAST(s1 AS DOUBLE) / n)
                               / ((CAST(s2 AS DOUBLE) / n
                                   - (CAST(s1 AS DOUBLE) / n)
                                     * (CAST(s1 AS DOUBLE) / n)) * n / (n - 1)),
                               6) END AS nb_p
        FROM m
    """,
    tags=("stats", "count-model", "events"),
)
def nb_overdispersion_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k")
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("s1"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("s2"),
    )
    n = F.col("n")
    mean = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") / n - mean * mean) * n / (n - 1)
    under = var <= mean
    return m.select(
        n.alias("n_users"),
        F.round(mean, 6).alias("mean_purchases"),
        # ordered degenerate guards mirror the oracle (one-row probe,
        # r11): the n < 2 branch short-circuits so the sample-variance
        # n−1 denominator is never evaluated there
        F.when(n < 2, F.lit(None)).otherwise(F.round(var, 6)).alias("var_purchases"),
        F.when((n < 2) | (F.col("s1") == 0), F.lit(None))
        .otherwise(F.round(var / mean, 6))
        .alias("dispersion_index"),
        F.when(n < 2, F.lit(None))
        .when(under, F.lit(None))
        .otherwise(F.round(mean * mean / (var - mean), 6))
        .alias("nb_r"),
        F.when(n < 2, F.lit(None))
        .when(under, F.lit(None))
        .otherwise(F.round(mean / var, 6))
        .alias("nb_p"),
    )


# ---------------------------------------------------------------------------
# Entropy rate of the first-order event-transition chain (Shannon 1948;
# Cover & Thomas Ch. 4): H = -sum_i pi_i sum_j P_ij ln P_ij with the
# empirical source distribution as pi — how predictable is the NEXT
# event given the current one, in nats. Reuses the per-user LAG
# transition counts (the markov family's only fact-sized work); the
# entropy double-sum runs on the type x type domain. Also emits the
# zeroth-order entropy H0 (ignoring the chain) — the gap H0 − H is the
# information the previous event carries.
# ---------------------------------------------------------------------------
@register(
    "entropy_rate_transitions",
    oracle="""
        WITH t AS (
            -- ts/event_type IS NOT NULL (r11 nulls probe): same chain
            -- convention as markov_transition_events — an untimestamped
            -- event has no place in the order, a typeless one is no state
            SELECT event_type AS dst,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS src
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        c AS (
            SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
            FROM t WHERE src IS NOT NULL GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c),
        rw AS (
            SELECT src, n,
                   CAST(n AS DOUBLE)
                   * LN(CAST(n AS DOUBLE)
                        / (SUM(n) OVER (PARTITION BY src))) AS term
            FROM c
        ),
        row_h AS (
            SELECT src, CAST(SUM(n) AS BIGINT) AS ns, SUM(term) AS sl
            FROM rw GROUP BY 1
        ),
        hr AS (
            SELECT -SUM(CAST(r.ns AS DOUBLE) / t.nt * (r.sl / r.ns)) AS h
            FROM row_h r CROSS JOIN tot t
        ),
        h0 AS (
            SELECT -SUM(CAST(ns AS DOUBLE) / t.nt
                        * LN(CAST(ns AS DOUBLE) / t.nt)) AS h0
            FROM (SELECT src, CAST(SUM(n) AS BIGINT) AS ns FROM c GROUP BY 1)
            CROSS JOIN tot t
        )
        SELECT ROUND(hr.h, 6) AS entropy_rate,
               ROUND(h0.h0, 6) AS entropy_zeroth,
               ROUND(h0.h0 - hr.h, 6) AS info_gain
        FROM hr CROSS JOIN h0
    """,
    tags=("stats", "information", "events"),
)
def entropy_rate_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("dst"),
        F.lag("event_type").over(w).alias("src"),
    ).where(F.col("src").isNotNull())
    c = t.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = c.agg(F.sum("n").cast("bigint").alias("nt"))
    ws = Window.partitionBy("src")
    row_h = (
        c.select(
            "src",
            "n",
            F.sum("n").over(ws).alias("ns_w"),
        )
        .select(
            "src",
            "n",
            (F.col("n").cast("double")
             * F.log(F.col("n").cast("double") / F.col("ns_w"))).alias("term"),
        )
        .groupBy("src")
        .agg(
            F.sum("n").cast("bigint").alias("ns"),
            F.sum("term").alias("sl"),
        )
    )
    hr = row_h.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(
            F.col("ns").cast("double") / F.col("nt")
            * (F.col("sl") / F.col("ns"))
        )).alias("h")
    )
    h0 = (
        c.groupBy("src")
        .agg(F.sum("n").cast("bigint").alias("ns"))
        .crossJoin(F.broadcast(tot))
        .agg(
            (-F.sum(
                F.col("ns").cast("double") / F.col("nt")
                * F.log(F.col("ns").cast("double") / F.col("nt"))
            )).alias("h0")
        )
    )
    return hr.crossJoin(F.broadcast(h0)).select(
        F.round("h", 6).alias("entropy_rate"),
        F.round("h0", 6).alias("entropy_zeroth"),
        F.round(F.col("h0") - F.col("h"), 6).alias("info_gain"),
    )


# ---------------------------------------------------------------------------
# McNemar paired-model comparison (McNemar 1947, continuity-corrected):
# is the bigram next-event model (session_next_event_accuracy's
# argmax-per-context) actually better than the marginal baseline
# (always predict the globally most frequent next type) ON THE SAME
# test transitions? Accuracy deltas lie; the paired discordant counts
# b (bigram right, baseline wrong) and c (baseline right, bigram
# wrong) carry the evidence: chi2 = (|b-c|-1)^2/(b+c), df = 1. Train on
# even users, test on odd (the shared split); ties in either argmax
# break lexicographically (deterministic in both engines). One
# fact-sized LAG + one broadcast model join; b and c are two integer
# sums.
# ---------------------------------------------------------------------------
@register(
    "mcnemar_bigram_vs_marginal",
    oracle=f"""
        WITH t AS (
            -- ts/event_type IS NOT NULL (r11 nulls probe): the markov
            -- chain convention — untimestamped events have no order,
            -- typeless events are no state
            SELECT user_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS prev
            FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ),
        train AS (
            SELECT prev, event_type AS nxt, CAST(COUNT(*) AS BIGINT) AS c
            FROM t WHERE prev IS NOT NULL AND user_id % 2 = 0
            GROUP BY 1, 2
        ),
        bigram AS (
            SELECT prev, nxt AS pred FROM (
                SELECT prev, nxt,
                       ROW_NUMBER() OVER (PARTITION BY prev
                           ORDER BY c DESC, nxt ASC) AS rk
                FROM train
            ) WHERE rk = 1
        ),
        marginal AS (
            SELECT nxt AS pred FROM (
                SELECT nxt, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC,
                                               nxt ASC) AS rk
                FROM train GROUP BY nxt
            ) WHERE rk = 1
        ),
        test AS (
            SELECT tt.event_type AS actual, bg.pred AS p_big, mg.pred AS p_mar
            FROM t tt
            JOIN bigram bg ON bg.prev = tt.prev
            CROSS JOIN marginal mg
            WHERE tt.prev IS NOT NULL AND tt.user_id % 2 = 1
        ),
        k AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(CASE WHEN p_big = actual AND p_mar <> actual
                                 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                   CAST(SUM(CASE WHEN p_mar = actual AND p_big <> actual
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                   CAST(SUM(CASE WHEN p_big = actual THEN 1 ELSE 0 END)
                        AS BIGINT) AS hit_big,
                   CAST(SUM(CASE WHEN p_mar = actual THEN 1 ELSE 0 END)
                        AS BIGINT) AS hit_mar
            FROM test
        )
        SELECT n_test, b AS bigram_only_right, c AS marginal_only_right,
               ROUND(CAST(hit_big AS DOUBLE) / n_test, 6) AS acc_bigram,
               ROUND(CAST(hit_mar AS DOUBLE) / n_test, 6) AS acc_marginal,
               CASE WHEN b + c = 0 THEN NULL
                    ELSE ROUND((ABS(b - c) - 1.0) * (ABS(b - c) - 1.0)
                               / (b + c), 6) END AS mcnemar_chi2,
               CASE WHEN b + c = 0 THEN 0
                    ELSE CAST((ABS(b - c) - 1.0) * (ABS(b - c) - 1.0)
                              / (b + c) > 3.841 AS INT) END AS reject_05
        FROM k
    """,
    tags=("stats", "eval", "hypothesis"),
)
def mcnemar_bigram_vs_marginal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts", "event_id")
        .filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNotNull()
    )
    train = (
        t.where(F.col("user_id") % 2 == 0)
        .groupBy("prev", F.col("event_type").alias("nxt"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wb = Window.partitionBy("prev").orderBy(F.desc("c"), F.asc("nxt"))
    bigram = (
        train.withColumn("rk", F.row_number().over(wb))
        .where(F.col("rk") == 1)
        .select("prev", F.col("nxt").alias("p_big"))
    )
    wm = Window.orderBy(F.desc("sc"), F.asc("nxt"))
    marginal = (
        train.groupBy("nxt")
        .agg(F.sum("c").alias("sc"))
        .withColumn("rk", F.row_number().over(wm))
        .where(F.col("rk") == 1)
        .select(F.col("nxt").alias("p_mar"))
    )
    test = (
        t.where(F.col("user_id") % 2 == 1)
        .join(F.broadcast(bigram), "prev")  # type-domain model side
        .crossJoin(F.broadcast(marginal))  # one-row baseline side
        .select(F.col("event_type").alias("actual"), "p_big", "p_mar")
    )
    k = test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(
            F.when(
                (F.col("p_big") == F.col("actual"))
                & (F.col("p_mar") != F.col("actual")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("b"),
        F.sum(
            F.when(
                (F.col("p_mar") == F.col("actual"))
                & (F.col("p_big") != F.col("actual")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(F.col("p_big") == F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("hit_big"),
        F.sum(F.when(F.col("p_mar") == F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("hit_mar"),
    )
    bc = F.col("b") + F.col("c")
    chi2 = (
        (F.abs(F.col("b") - F.col("c")) - 1.0)
        * (F.abs(F.col("b") - F.col("c")) - 1.0)
        / bc
    )
    return k.select(
        "n_test",
        F.col("b").alias("bigram_only_right"),
        F.col("c").alias("marginal_only_right"),
        F.round(F.col("hit_big").cast("double") / F.col("n_test"), 6).alias(
            "acc_bigram"
        ),
        F.round(F.col("hit_mar").cast("double") / F.col("n_test"), 6).alias(
            "acc_marginal"
        ),
        F.when(bc == 0, F.lit(None)).otherwise(F.round(chi2, 6)).alias(
            "mcnemar_chi2"
        ),
        F.when(bc == 0, F.lit(0)).otherwise(
            (chi2 > 3.841).cast("int")
        ).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test for randomness of daily revenue around its
# median (Wald & Wolfowitz 1940): too FEW runs of above/below-median
# days = trending/clustered; too MANY = oscillating. The median is the
# LOWER median (rank (n+1)//2, integer-exact in both engines); equal-to-
# median days drop (the standard treatment). R, n1, n2 are integers from
# one LAG pass over the day domain; E[R] and Var[R] are exact-integer
# ratios; z rounds at 6 dp. Everything below the daily grouped sum is
# day-domain-sized.
# ---------------------------------------------------------------------------
@register(
    "runs_test_daily_revenue",
    oracle=f"""
        WITH daily AS (
            -- ts/value IS NOT NULL (r11 nulls probe): the series is over
            -- timestamped, valued purchases — the NULL day would lead
            -- Spark's run order and trail DuckDB's
            SELECT epoch_ns(ts) // {86_400_000_000_000} AS day,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events
            WHERE event_type = 'purchase'
              AND ts IS NOT NULL AND value IS NOT NULL
            GROUP BY 1
        ),
        med AS (
            SELECT cents AS m FROM (
                SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, day) AS rk,
                       COUNT(*) OVER () AS n
                FROM daily
            ) WHERE rk = (n + 1) // 2
        ),
        signs AS (
            SELECT day, CAST(cents > med.m AS INT) AS above
            FROM daily CROSS JOIN med WHERE cents <> med.m
        ),
        runs AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(above) AS BIGINT) AS n1,
                   CAST(COUNT(*) - SUM(above) AS BIGINT) AS n2,
                   CAST(1 + SUM(CASE WHEN prev IS NOT NULL
                                      AND prev <> above THEN 1 ELSE 0 END)
                        AS BIGINT) AS r
            FROM (
                SELECT above, LAG(above) OVER (ORDER BY day) AS prev
                FROM signs
            )
        )
        SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
               -- n1+n2 = 0 (every day AT the median, signs empty) makes
               -- the mean itself undefined → NULL, not a 0/0 (tiny-
               -- corpus probe, bug 27's sibling branch)
               CASE WHEN n1 + n2 = 0 THEN NULL
                    ELSE ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2), 6)
               END AS expected_runs,
               -- zero-variance guard: 2·n1·n2 − n1 − n2 = 0 exactly at
               -- n1 = n2 = 1 (probe-found, bug 27: DuckDB fabricated a
               -- NaN z while ANSI Spark threw DIVIDE_BY_ZERO) — the
               -- statistic is undefined, same convention as n1/n2 = 0
               CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2
                         OR 2 * n1 * n2 - n1 - n2 <= 0 THEN NULL
                    ELSE ROUND((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                               / SQRT(2.0 * n1 * n2
                                      * (2.0 * n1 * n2 - n1 - n2)
                                      / ((n1 + n2) * 1.0 * (n1 + n2)
                                         * (n1 + n2 - 1))), 6) END AS z,
               CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2
                         OR 2 * n1 * n2 - n1 - n2 <= 0 THEN 0
                    ELSE CAST(ABS((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                               / SQRT(2.0 * n1 * n2
                                      * (2.0 * n1 * n2 - n1 - n2)
                                      / ((n1 + n2) * 1.0 * (n1 + n2)
                                         * (n1 + n2 - 1)))) > 1.96 AS INT)
               END AS reject_05
        FROM runs
    """,
    tags=("stats", "hypothesis", "timeseries"),
)
def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    daily = ev.groupBy(F.expr("ts DIV 86400000000000").alias("day")).agg(
        F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("cents", "day")
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        daily.select(
            "cents",
            F.row_number().over(w).alias("rk"),
            F.count(F.lit(1)).over(wall).alias("n"),
        )
        .where(F.col("rk") == F.expr("(n + 1) DIV 2"))
        .select(F.col("cents").alias("m"))
    )
    signs = (
        daily.crossJoin(F.broadcast(med))  # one-row median side
        .where(F.col("cents") != F.col("m"))
        .select("day", (F.col("cents") > F.col("m")).cast("int").alias("above"))
    )
    lagged = signs.select(
        "above", F.lag("above").over(Window.orderBy("day")).alias("prev")
    )
    runs = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("above").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("above")).cast("bigint").alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("prev") != F.col("above")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    er = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    z = (r - er) / F.sqrt(
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1))
    )
    # zero-variance guard (probe-found, bug 27): 2·n1·n2 − n1 − n2 = 0
    # exactly at n1 = n2 = 1 — the unguarded z was an ANSI 0-divide here
    # (and a fabricated NaN in the oracle); statistic undefined → NULL z,
    # reject 0, the same convention as the n1/n2 = 0 branch
    degen = (n1 == 0) | (n2 == 0) | (n1 + n2 < 2) | (2 * n1 * n2 - n1 - n2 <= 0)
    return runs.select(
        n1.alias("n_above"),
        n2.alias("n_below"),
        r.alias("n_runs"),
        # all-at-median corpus: signs is empty, the mean is undefined
        F.when(n1 + n2 == 0, F.lit(None)).otherwise(F.round(er, 6)).alias("expected_runs"),
        F.when(degen, F.lit(None)).otherwise(F.round(z, 6)).alias("z"),
        F.when(degen, F.lit(0))
        .otherwise((F.abs(z) > 1.96).cast("int"))
        .alias("reject_05"),
    )
