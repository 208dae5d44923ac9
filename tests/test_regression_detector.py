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
