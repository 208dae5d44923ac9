"""Incremental aggregate maintenance from snapshot diffs.

The reference refreshes everything with truncate-and-reload
(etl/pipeline.py:685-697). At 100 TB a daily full re-aggregation is the
single most expensive recurring job a warehouse runs; the standard fix is
incremental view maintenance: diff the fact snapshots, find which GROUPS
are touched, re-aggregate only those groups' new rows, and carry every
other group's previous result forward untouched.

Plan shape (three shuffles, all proportional to the CHANGE volume, not
the table):
1. ``snapshot_diff(old, new, row_key)`` — one full-outer join on the row
   key (co-located when both snapshots are bucketed on it);
2. affected groups = distinct group keys of rows whose key changed, taken
   from BOTH sides (a group loses membership when its last row leaves);
3. re-aggregate ``new ⋉ affected`` + anti-join carry-forward of
   ``prev_agg`` — the aggregate relation is groups-sized, so both the
   semi and anti probes broadcast.

Correctness contract: the result equals ``new.groupBy(...).agg(...)``
exactly — the query-level oracle runs the full recompute, so the
incremental path is hash-checked against it cell-for-cell; the unit test
additionally poisons an untouched group in ``prev_agg`` to prove the
carried-forward rows really come from the previous aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.diff import snapshot_diff


def incremental_agg_refresh(
    prev_agg: DataFrame,
    old: DataFrame,
    new: DataFrame,
    row_key: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Maintain ``prev_agg`` (= old.groupBy(group_cols).agg(*aggs)) into
    the aggregate of ``new``, recomputing only groups touched by the
    old→new diff. ``aggs`` must be full aggregate expressions with stable
    aliases matching ``prev_agg``'s columns.
    """
    # changed_keys feeds two semi-joins and affected feeds three probes:
    # left as lazy lineage, each consumer re-runs the full-outer diff (the
    # profiler showed the old/new snapshots rebuilt 14x in one refresh).
    # Both relations are CHANGE-volume-sized by this operator's contract,
    # so materializing them once is exactly the production shape (guide
    # §5: cache what is reused and expensive to recompute).
    changed_keys = (
        snapshot_diff(old, new, [row_key])
        .filter(F.col("status") != "unchanged")
        .select(row_key)
        .localCheckpoint(eager=False)
    )
    affected = (
        old.join(changed_keys, row_key, "leftsemi")
        .select(*group_cols)
        .unionByName(new.join(changed_keys, row_key, "leftsemi").select(*group_cols))
        .distinct()
        .localCheckpoint(eager=False)
    )
    recomputed = (
        new.join(F.broadcast(affected), group_cols, "leftsemi")
        .groupBy(*group_cols)
        .agg(*aggs)
    )
    carried = prev_agg.join(F.broadcast(affected), group_cols, "leftanti")
    return carried.unionByName(recomputed)
