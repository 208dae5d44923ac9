"""Snapshot diff: the four statuses, null-safe comparison, multi-column
keys, and the whole-plan shuffle count."""

from __future__ import annotations

import pytest

from etl_pipeline_spark.operators.diff import snapshot_diff


def test_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id bigint, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "id bigint, v string"
    )
    got = {r.id: r.status for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_null_safe_compare(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "id bigint, v string")
    new = spark.createDataFrame([(1, None), (2, "x")], "id bigint, v string")
    got = {r.id: r.status for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {1: "unchanged", 2: "changed"}


def test_multi_column_key(spark):
    old = spark.createDataFrame([(1, "x", 10), (1, "y", 20)], "a bigint, b string, v bigint")
    new = spark.createDataFrame([(1, "x", 10), (1, "z", 30)], "a bigint, b string, v bigint")
    got = {(r.a, r.b): r.status for r in snapshot_diff(old, new, ["a", "b"]).collect()}
    assert got == {(1, "x"): "unchanged", (1, "y"): "removed", (1, "z"): "added"}


def test_requires_keys(spark):
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, [])


def test_single_join_in_plan(spark):
    old = spark.createDataFrame([(1, "a")], "id bigint, v string")
    new = spark.createDataFrame([(1, "a")], "id bigint, v string")
    plan = snapshot_diff(old, new, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1  # one full-outer join, nothing else
