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


def test_scd2_build_and_lookup(spark):
    from pyspark.sql import Row
    from etl_pipeline_spark.operators.timeseries import scd2_build, scd2_lookup

    changes = spark.createDataFrame(
        [
            Row(k=1, t=10, state="a"),
            Row(k=1, t=20, state="b"),
            Row(k=1, t=30, state="c"),
            Row(k=2, t=15, state="x"),
        ]
    )
    dim = scd2_build(changes, "k", "t", ["state"])
    rows = {(r.k, r.state): r for r in dim.collect()}
    assert rows[(1, "a")].valid_from == 10 and rows[(1, "a")].valid_to == 20
    assert rows[(1, "b")].valid_to == 30 and rows[(1, "b")].is_current == 0
    assert rows[(1, "c")].valid_to is None and rows[(1, "c")].is_current == 1
    assert rows[(2, "x")].is_current == 1

    facts = spark.createDataFrame(
        [
            Row(k=1, ft=5),    # before first version → dropped
            Row(k=1, ft=10),   # boundary: valid_from inclusive
            Row(k=1, ft=29),   # inside [20, 30)
            Row(k=1, ft=30),   # boundary: valid_to exclusive → version c
            Row(k=2, ft=99),   # open-ended current
        ]
    )
    out = {r.ft: r.state for r in scd2_lookup(facts, dim, "k", "ft").collect()}
    assert out == {10: "a", 29: "b", 30: "c", 99: "x"}
