"""Incremental aggregate maintenance: equality with full recompute AND
proof that untouched groups are carried forward, not recomputed."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.incremental import incremental_agg_refresh


def _facts(spark, rows):
    return spark.createDataFrame([Row(k=k, grp=g, v=float(v)) for k, g, v in rows])


def _aggs():
    # built lazily: Column construction needs an active session
    return [F.sum("v").alias("total"), F.count(F.lit(1)).cast("bigint").alias("n")]


def test_incremental_equals_full_recompute(spark):
    old = _facts(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "c", 7)])
    # changed: k=2 (a); removed: k=3 (b drops entirely); added: k=5 (new group d)
    new = _facts(spark, [(1, "a", 10), (2, "a", 25), (4, "c", 7), (5, "d", 3)])
    prev = old.groupBy("grp").agg(*_aggs())
    got = incremental_agg_refresh(prev, old, new, "k", ["grp"], _aggs())
    want = new.groupBy("grp").agg(*_aggs())
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_untouched_groups_are_carried_not_recomputed(spark):
    old = _facts(spark, [(1, "a", 10), (2, "b", 20)])
    new = _facts(spark, [(1, "a", 10), (2, "b", 99)])  # only b touched
    # poison group a in prev_agg: if the operator recomputed a, the poison
    # would be healed; carrying it forward proves a was never re-aggregated
    prev = spark.createDataFrame(
        [Row(grp="a", total=-777.0, n=41), Row(grp="b", total=20.0, n=1)]
    )
    got = {r.grp: (r.total, r.n) for r in
           incremental_agg_refresh(prev, old, new, "k", ["grp"], _aggs()).collect()}
    assert got["a"] == (-777.0, 41)  # carried forward verbatim
    assert got["b"] == (99.0, 1)  # recomputed from new


def test_group_vanishes_when_last_row_removed(spark):
    old = _facts(spark, [(1, "a", 1), (2, "b", 2)])
    new = _facts(spark, [(1, "a", 1)])
    prev = old.groupBy("grp").agg(*_aggs())
    got = incremental_agg_refresh(prev, old, new, "k", ["grp"], _aggs())
    assert [r.grp for r in got.collect()] == ["a"]
