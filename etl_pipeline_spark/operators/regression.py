"""Performance-regression detection as a relation (SURVEY.md §2.9 R10).

The reference keeps a 600-LoC stateful detector (baselines file, z-score
anomaly check, percent-magnitude threshold, trend slope —
etl/utils/regression_detector.py:26-171). The engine re-expresses it as
one window/aggregate query over a metrics HISTORY relation
(run, series, value): the baseline is the aggregate of prior runs, the
check is arithmetic on the current run's row, and "state" is just the
metrics table — mergeable, queryable, and computed by the same engine
that produced the metrics (RunSummary.to_df).

Scale shape: one shuffle keyed on the series id; baseline state is one
row of moments per series whatever the history length. Determinism: all
inputs are rounded (6 dp) before moment aggregation and all outputs after
(4 dp), so partial-agg ordering can't leak into the flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def detect_regressions(
    history: DataFrame,
    series_cols: list[str],
    run_col: str,
    value_col: str,
    current_run: Column | int | str | None = None,
    threshold_sigma: float = 2.0,
    min_magnitude_pct: float = 10.0,
    min_history: int = 3,
    direction: Column | int | None = None,
) -> DataFrame:
    """Flag series whose current-run value regresses vs their own history.

    Output per series: current value, baseline mean/stddev over PRIOR
    runs, z-score, percent magnitude, and is_regression — the reference's
    RegressionBaseline.is_regression + is_significant semantics
    (directed deviation > threshold_sigma AND |magnitude| >
    min_magnitude_pct AND enough history), computed relationally.

    `direction` mirrors the reference's per-metric direction logic
    (etl/utils/regression_detector.py: duration-style metrics regress when
    they go UP, throughput/success_rate-style metrics when they go DOWN):
    +1 flags z > threshold (higher is worse), −1 flags −z > threshold
    (lower is worse; a throughput collapse IS flagged), and it may be a
    per-row Column (e.g. a CASE over a metric-name column) when one
    relation carries both kinds. The default None is two-sided —
    |z| > threshold — for metrics with no inherent direction.

    Series with no prior-run history are NOT dropped: the baseline join is
    a left join, they surface with n_history=0 (NULL baseline moments,
    zeroed z/magnitude) and can never be flagged — instead of silently
    vanishing from the report.

    current_run=None means "the latest run", resolved relationally
    (broadcast single-row max — no driver collect, empty history yields an
    empty result instead of an error)."""
    if current_run is None:
        mx = history.agg(F.max(run_col).alias("__cur"))
        history = history.crossJoin(F.broadcast(mx))
        cur_lit = F.col("__cur")
    else:
        cur_lit = current_run if isinstance(current_run, Column) else F.lit(current_run)
    val = F.round(F.col(value_col), 6)
    # 1e-6-unit integer twin of val: the 6-dp-rounded input is a LATTICE,
    # so the 4-dp baseline_mean/current_value outputs use the portable
    # FLOOR half-up over exact integers — ROUND over the jittered AVG (or
    # over a single lattice point sitting ON a .00005 repr-tie) splits
    # the engines (probe-found, seed 283). _mean/_std stay double for the
    # z/magnitude ratios (dense-rational convention).
    base = (
        history.filter(F.col(run_col) < cur_lit)
        .groupBy(*series_cols)
        .agg(
            F.avg(val).alias("_mean"),
            F.expr(
                f"FLOOR(SUM(CAST(ROUND(ROUND({value_col}, 6) * 1.0e6, 0)"
                " AS BIGINT)) * 1.0e0 / 100.0e0 / COUNT(*) + 0.5e0) / 1.0e4"
            ).alias("_mean4"),
            F.stddev_pop(val).alias("_std"),
            F.count(F.lit(1)).alias("n_history"),
        )
    )
    cur = history.filter(F.col(run_col) == cur_lit).select(
        *series_cols,
        val.alias("current_value"),
        F.expr(
            "FLOOR(" + f"CAST(ROUND(ROUND({value_col}, 6) * 1.0e6, 0) AS BIGINT)"
            " * 1.0e0 / 100.0e0 + 0.5e0) / 1.0e4"
        ).alias("_cur4"),
    )
    z = F.when(
        F.col("_std") > 0, (F.col("current_value") - F.col("_mean")) / F.col("_std")
    ).otherwise(F.lit(0.0))
    magnitude = F.when(
        F.col("_mean") != 0,
        (F.col("current_value") - F.col("_mean")) / F.col("_mean") * 100.0,
    ).otherwise(F.lit(0.0))
    if direction is None:
        directed_z = F.abs(F.col("z_score"))
    else:
        dir_col = direction if isinstance(direction, Column) else F.lit(direction)
        directed_z = F.col("z_score") * dir_col
    flagged = (
        cur.join(base, series_cols, "left")
        .withColumn("n_history", F.coalesce(F.col("n_history"), F.lit(0).cast("bigint")))
        .withColumn("z_score", F.round(z, 4))
        .withColumn("magnitude_pct", F.round(magnitude, 4))
        .withColumn(
            "is_regression",
            (
                (F.col("n_history") >= min_history)
                & (directed_z > threshold_sigma)
                & (F.abs(F.col("magnitude_pct")) > min_magnitude_pct)
            ).cast("int"),
        )
    )
    return flagged.select(
        *series_cols,
        F.col("_cur4").alias("current_value"),  # FLOOR device — see above
        F.col("_mean4").alias("baseline_mean"),
        F.round("_std", 4).alias("baseline_std"),
        "n_history",
        "z_score",
        "magnitude_pct",
        "is_regression",
    )


def trend_slopes(
    history: DataFrame,
    series_cols: list[str],
    run_col: str,
    value_col: str,
) -> DataFrame:
    """Per-series linear trend (the detector's detect_trend) as one
    aggregate: OLS slope = cov(run, value)/var(run) via moment sums —
    no window scan, one shuffle on the series key."""
    val = F.round(F.col(value_col), 6)
    run = F.col(run_col).cast("double")
    agg = history.groupBy(*series_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(run).alias("sx"),
        F.sum(val).alias("sy"),
        F.sum(run * val).alias("sxy"),
        F.sum(run * run).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    ).otherwise(F.lit(0.0))
    return agg.select(
        *series_cols,
        F.col("n").cast("bigint").alias("n_runs"),
        F.round(slope, 6).alias("slope"),
    )
