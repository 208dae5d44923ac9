"""Regression detector (SURVEY.md §2.9 R10): baseline z-score flagging and
trend slopes over a metrics history relation — the relational form of the
reference's stateful detector (etl/utils/regression_detector.py:26-171)."""

from __future__ import annotations

from pyspark.sql import Row

from etl_pipeline_spark.operators.regression import detect_regressions, trend_slopes


def _history(spark):
    rows = []
    # stable series: ~10.0 every run, tiny jitter
    for r in range(6):
        rows.append(Row(run=r, series="stable", value=10.0 + 0.1 * (r % 2)))
    # regressed series: flat 5.0 history, current run 3x worse
    for r in range(5):
        rows.append(Row(run=r, series="regressed", value=5.0 + 0.05 * (r % 3)))
    rows.append(Row(run=5, series="regressed", value=15.0))
    # young series: only 2 prior runs -> insufficient history, never flagged
    rows.append(Row(run=3, series="young", value=1.0))
    rows.append(Row(run=4, series="young", value=1.0))
    rows.append(Row(run=5, series="young", value=99.0))
    return spark.createDataFrame(rows)


def test_detect_regressions_flags_only_true_regression(spark):
    out = {
        r.series: r
        for r in detect_regressions(
            _history(spark), ["series"], "run", "value", current_run=5
        ).collect()
    }
    assert out["regressed"].is_regression == 1
    assert out["regressed"].z_score > 2.0
    assert out["regressed"].magnitude_pct > 100.0
    assert out["stable"].is_regression == 0
    # young series spikes hard but lacks min_history -> not flagged
    assert out["young"].n_history == 2 and out["young"].is_regression == 0


def test_detect_regressions_is_two_sided_by_default(spark):
    # a collapse (current far BELOW baseline) is an anomaly too: |z| flags it
    rows = [Row(run=r, series="collapse", value=100.0 + 0.5 * (r % 2)) for r in range(5)]
    rows.append(Row(run=5, series="collapse", value=10.0))
    out = detect_regressions(
        spark.createDataFrame(rows), ["series"], "run", "value", current_run=5
    ).collect()[0]
    assert out.z_score < -2.0 and out.is_regression == 1


def test_detect_regressions_direction_aware(spark):
    # throughput-style series: LOWER is a regression (reference metric-
    # direction logic); duration-style: HIGHER is a regression
    rows = [Row(run=r, series="throughput", value=100.0 + 0.5 * (r % 2)) for r in range(5)]
    rows.append(Row(run=5, series="throughput", value=10.0))
    df = spark.createDataFrame(rows)
    drop_flagged = detect_regressions(
        df, ["series"], "run", "value", current_run=5, direction=-1
    ).collect()[0]
    assert drop_flagged.is_regression == 1
    # with direction=+1 (higher is worse) the same collapse is NOT a regression
    drop_ignored = detect_regressions(
        df, ["series"], "run", "value", current_run=5, direction=1
    ).collect()[0]
    assert drop_ignored.is_regression == 0


def test_detect_regressions_reports_series_with_no_history(spark):
    # a series first seen in the current run surfaces with n_history=0
    # (instead of silently dropping out of the report) and is never flagged
    rows = [Row(run=r, series="old", value=1.0) for r in range(5)]
    rows.append(Row(run=5, series="old", value=1.0))
    rows.append(Row(run=5, series="brand_new", value=42.0))
    out = {
        r.series: r
        for r in detect_regressions(
            spark.createDataFrame(rows), ["series"], "run", "value", current_run=5
        ).collect()
    }
    nb = out["brand_new"]
    assert nb.n_history == 0 and nb.is_regression == 0
    assert nb.baseline_mean is None and nb.baseline_std is None
    assert nb.z_score == 0.0 and nb.magnitude_pct == 0.0


def test_detect_regressions_zero_std_baseline(spark):
    rows = [Row(run=r, series="const", value=2.0) for r in range(4)]
    rows.append(Row(run=4, series="const", value=2.0))
    df = spark.createDataFrame(rows)
    r = detect_regressions(df, ["series"], "run", "value", current_run=4).collect()[0]
    assert r.z_score == 0.0 and r.is_regression == 0


def test_trend_slopes(spark):
    rows = [Row(run=r, series="up", value=1.0 + 2.0 * r) for r in range(5)]
    rows += [Row(run=r, series="flat", value=7.0) for r in range(5)]
    got = {r.series: r.slope for r in trend_slopes(
        spark.createDataFrame(rows), ["series"], "run", "value"
    ).collect()}
    assert abs(got["up"] - 2.0) < 1e-9
    assert got["flat"] == 0.0


def test_detect_regressions_latest_run_relational_and_empty_history(spark):
    # current_run=None resolves the latest run without a driver collect
    out = {
        r.series: r
        for r in detect_regressions(
            _history(spark), ["series"], "run", "value", current_run=None
        ).collect()
    }
    assert out["regressed"].is_regression == 1 and out["stable"].is_regression == 0

    # empty history -> empty result, not an error
    empty = spark.createDataFrame(
        [], "run int, series string, value double"
    )
    assert detect_regressions(empty, ["series"], "run", "value").count() == 0
