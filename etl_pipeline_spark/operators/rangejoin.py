"""Bucketed interval (range) join — equi-join plan for time-range predicates.

A raw range join (``r.ts BETWEEN l.ts - Δ AND l.ts``) has no equi conjunct,
so Spark plans a nested-loop join — quadratic per key group and a broadcast
requirement at that. The standard scale fix (Databricks' range-join
optimization, Flink's interval join) is binning: quantize time into
``bucket_width`` bins, explode the probe side to every bin its interval
overlaps, equi-join on (bin [+ other keys]), then apply the exact range
predicate as a residual filter.

Cost model: the probe side duplicates ⌈Δ/width⌉+1 times; the join is a hash
equi-join whose key includes the bin, so the shuffle partitions by time —
at 100 TB this is the difference between a cluster-wide nested loop and a
partition-pruned hash join. Pick ``bucket_width`` ≈ Δ so the explode factor
stays ≤ 2.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_offset: int,
    upper_offset: int,
    bucket_width: int,
    equi_keys: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Inner-join rows where ``right.right_ts`` ∈ [left.left_ts +
    lower_offset, left.left_ts + upper_offset] (same integer unit
    throughout, e.g. ns).

    ``equi_keys`` are (left_col, right_col) pairs added to the join key
    (e.g. user_id = user_id). Each right row carries ONE bin and each left
    row probes every bin its window overlaps — so matches are exact with no
    post-join dedup. For left-outer semantics, aggregate this inner result
    per left key and left-join it back (keeps the outer join off the
    exploded relation).
    """
    if lower_offset > upper_offset:
        raise ValueError("lower_offset must be <= upper_offset")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    lo_bin = F.floor((F.col(left_ts) + F.lit(lower_offset)) / F.lit(bucket_width))
    hi_bin = F.floor((F.col(left_ts) + F.lit(upper_offset)) / F.lit(bucket_width))
    probe = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    build = right.withColumn(
        "__bin", F.floor(F.col(right_ts) / F.lit(bucket_width))
    )
    cond: Column = probe["__bin"] == build["__bin"]
    for lc, rc in equi_keys:
        cond = cond & (probe[lc] == build[rc])
    cond = (
        cond
        & (build[right_ts] >= probe[left_ts] + F.lit(lower_offset))
        & (build[right_ts] <= probe[left_ts] + F.lit(upper_offset))
    )
    return probe.join(build, cond, "inner").drop("__bin")
