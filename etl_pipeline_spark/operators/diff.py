"""Snapshot diff — row-level change detection between table versions.

The reference refreshes every source with full truncate-and-reload
(etl/pipeline.py:685-697); it can never answer "what changed since
yesterday?". This operator closes that gap: given two snapshots keyed the
same way, emit each key's status — added / removed / changed / unchanged
— as a relation. Feed `changed ∪ added` to `merge_upsert` for an
incremental load, or aggregate statuses for drift monitoring.

Plan shape: one full outer join on the key (the only shuffle), null-safe
struct equality over the compared columns — no UDFs, fully
codegen-eligible. At 100 TB both snapshots are partitioned the same way
on the key, so the join co-locates; with the table z-ordered or bucketed
on the key the shuffle disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key_cols..., status) for every key in either snapshot.

    ``compare_cols`` defaults to all shared non-key columns. Comparison is
    null-safe (NULL == NULL is a match, NULL vs value is a change).
    """
    if not key_cols:
        raise ValueError("snapshot_diff requires key columns")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]

    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_old_vals"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        F.struct(*[F.col(c) for c in compare_cols]).alias("_new_vals"),
        F.lit(True).alias("_in_new"),
    )
    joined = o.join(n, [f"k_{k}" for k in key_cols], "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("_old_vals").eqNullSafe(F.col("_new_vals")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[F.col(f"k_{k}").alias(k) for k in key_cols], status.alias("status")
    )
