"""values_df must be a drop-in for spark.createDataFrame on literal
tables: identical schema and identical values (including IEEE doubles,
NULLs, quotes/backslashes in strings) — while planning to a LocalRelation
(LocalTableScan: zero tasks, zero Python workers) instead of a
defaultParallelism-sliced pickled RDD."""

from __future__ import annotations

import math

from etl_pipeline_spark.utils.local_rows import values_df

_SCHEMA = "name string, n bigint, x double, ok boolean"
_ROWS = [
    ("plain", 1, 1.9, True),
    ("it's о'quoted", -7, -0.1, False),
    ("back\\slash", 2**40, 37700.215, None),
    (None, None, None, True),
    ("tiny", 0, 5e-324, False),  # denormal min: repr round-trip
    ("big", 42, 1.7976931348623157e308, True),
]


def test_values_df_matches_create_dataframe(spark):
    a = values_df(spark, _ROWS, _SCHEMA)
    b = spark.createDataFrame(_ROWS, _SCHEMA)
    assert a.schema == b.schema
    ra, rb = a.collect(), b.collect()
    assert len(ra) == len(rb) == len(_ROWS)
    for x, y in zip(ra, rb):
        for vx, vy in zip(x, y):
            if isinstance(vx, float):
                assert (vx == vy) or (math.isnan(vx) and math.isnan(vy))
                # bit-identical, not just ==
                assert str(vx) == str(vy)
            else:
                assert vx == vy


def test_values_df_is_a_local_relation(spark):
    df = values_df(spark, _ROWS, _SCHEMA)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert df.rdd.getNumPartitions() <= len(_ROWS)


def test_values_df_empty_matches_schema(spark):
    a = values_df(spark, [], _SCHEMA)
    b = spark.createDataFrame([], _SCHEMA)
    assert a.schema == b.schema
    assert a.collect() == []


def test_values_df_ragged_rows_raise(spark):
    import pytest

    with pytest.raises(ValueError, match="row 1 has 3 values for 4"):
        values_df(spark, [("a", 1, 1.0, True), ("b", 2, 2.0)], _SCHEMA)
    with pytest.raises(ValueError, match="row 0 has 5 values for 4"):
        values_df(spark, [("a", 1, 1.0, True, "extra")], _SCHEMA)


def test_values_df_all_non_null_column_nullability(spark):
    """Documented divergence from createDataFrame (ADVICE r11): a column
    with no NULL row infers nullable=False from the VALUES inline table,
    where createDataFrame always yields nullable=True. Values still
    match; only the nullability flag differs — pinned here so a silent
    behavior change in either direction fails loudly."""
    rows = [("a", 1), ("b", 2)]
    a = values_df(spark, rows, "s string, n bigint")
    b = spark.createDataFrame(rows, "s string, n bigint")
    assert [f.nullable for f in a.schema.fields] == [False, False]
    assert [f.nullable for f in b.schema.fields] == [True, True]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
