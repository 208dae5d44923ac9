"""Unit tests for the expectations operators (violation semantics, NULL
handling, empty-check guards)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.expectations import (
    check_foreign_key,
    check_not_null,
    check_range,
    check_unique,
    union_violations,
)


def test_not_null_and_range(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, 50), (3, "c", -1)], "id bigint, name string, v bigint"
    )
    assert [r.id for r in check_not_null(df, ["name"]).collect()] == [2]
    assert sorted(r.id for r in check_range(df, F.col("v").between(0, 10)).collect()) == [2, 3]
    with pytest.raises(ValueError):
        check_not_null(df, [])


def test_unique_returns_all_participants(spark):
    df = spark.createDataFrame(
        [(1, "k1"), (2, "k1"), (3, "k2")], "id bigint, k string"
    )
    assert sorted(r.id for r in check_unique(df, ["k"]).collect()) == [1, 2]


def test_foreign_key_ignores_null_children(spark):
    child = spark.createDataFrame([(1, 10), (2, 99), (3, None)], "id bigint, fk bigint")
    parent = spark.createDataFrame([(10,)], "pk bigint")
    viol = check_foreign_key(child, "fk", parent, "pk")
    assert [r.id for r in viol.collect()] == [2]  # NULL fk is not a violation


def test_union_violations_shape(spark):
    a = spark.createDataFrame([(1,)], "rid bigint")
    b = spark.createDataFrame([(2,), (3,)], "rid bigint")
    got = union_violations({"ca": a, "cb": b}, "rid")
    assert got.columns == ["check", "row_id"]
    assert got.count() == 3


def test_violation_counts_reports_clean_checks_as_zero(spark):
    """A check with ZERO violations must still appear in the counts
    relation with n_violations = 0 — groupBy over the violation union
    silently drops clean checks (round-9 sweep found the registered
    expectations_violation_counts returning 2 rows where the oracle's
    per-check COUNT(*) CTEs return 3 on a corpus where one check is
    clean)."""
    from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    got = {
        r.check_name: r.n_violations
        for r in REGISTRY["expectations_violation_counts"]
        .spark_fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    # all three registered checks always present, violations or not
    assert set(got) == {"fk_part", "range_totalprice", "unique_cust_day"}
