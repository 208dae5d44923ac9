"""Unit tests for resample_ffill: gap filling, forward-fill semantics,
per-key span isolation, deterministic tie-breaking."""

from __future__ import annotations

from etl_pipeline_spark.operators.timeseries import resample_ffill


def test_gaps_filled_forward(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0, 1), ("a", 25, 5.0, 2), ("b", 13, 9.0, 3)],
        "k string, t bigint, v double, oid bigint",
    )
    got = sorted(
        (r.k, r.bucket_start, r.v)
        for r in resample_ffill(df, "k", "t", "v", step=10, order_col="oid").collect()
    )
    # a spans buckets 0..2: observed at 0, gap at 10 (carried 1.0), observed 5.0 at 20
    # b spans only bucket 10 (its own min=max) — no bleed from a's span
    assert got == [("a", 0, 1.0), ("a", 10, 1.0), ("a", 20, 5.0), ("b", 10, 9.0)]


def test_last_observation_wins_in_bucket(spark):
    df = spark.createDataFrame(
        [("a", 5, 1.0, 1), ("a", 9, 2.0, 2), ("a", 9, 3.0, 3)],
        "k string, t bigint, v double, oid bigint",
    )
    got = resample_ffill(df, "k", "t", "v", step=10, order_col="oid").collect()
    assert [(r.k, r.bucket_start, r.v) for r in got] == [("a", 0, 3.0)]  # ties → max oid
