"""Unit tests for the bucketed interval join: boundary inclusion, bin-edge
crossing, equi-key isolation, and match-exactness vs a naive theta join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.rangejoin import bucketed_interval_join


def _df(spark, name, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_matches_naive_theta_join(spark):
    left = _df(spark, "l", [(i, 10 * i, i % 3) for i in range(40)], ["lid", "lts", "lkey"])
    right = _df(spark, "r", [(j, 7 * j, j % 3) for j in range(60)], ["rid", "rts", "rkey"])
    got = (
        bucketed_interval_join(
            left, right, "lts", "rts", -25, 13, 16, equi_keys=(("lkey", "rkey"),)
        )
        .select("lid", "rid")
        .collect()
    )
    naive = left.join(
        right,
        (F.col("lkey") == F.col("rkey"))
        & (F.col("rts") >= F.col("lts") - 25)
        & (F.col("rts") <= F.col("lts") + 13),
    ).select("lid", "rid").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    assert len(got) == len(set(map(tuple, got)))  # no duplicate matches


def test_boundaries_inclusive_and_bin_edges(spark):
    left = _df(spark, "l", [(1, 100)], ["lid", "lts"])
    right = _df(spark, "r", [(1, 90), (2, 89), (3, 110), (4, 111)], ["rid", "rts"])
    got = {
        r.rid
        for r in bucketed_interval_join(left, right, "lts", "rts", -10, 10, 7).collect()
    }
    assert got == {1, 3}  # ±10 inclusive, 89/111 out, bins of 7 don't matter


def test_rejects_bad_args(spark):
    df = _df(spark, "x", [(1, 1)], ["i", "t"])
    with pytest.raises(ValueError):
        bucketed_interval_join(df, df, "t", "t", 5, 1, 10)
    with pytest.raises(ValueError):
        bucketed_interval_join(df, df, "t", "t", -1, 1, 0)
