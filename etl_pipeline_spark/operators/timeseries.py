"""Time-series regularization: resample onto a fixed grid + forward fill.

The gap-filling shape every feature pipeline needs (sensor rollups, user
activity grids, training-label alignment): bucket event time, keep the
last observation per (key, bucket), densify to the full per-key bucket
range with `sequence` + `explode`, and forward-fill missing buckets with
`last(..., ignorenulls)` over an ordered window.

Scale: one shuffle on (key, bucket) for the last-per-bucket reduction, one
shuffle on key for the fill window. The grid explode generates only
(max-min)/step rows per key — never a cross join against a calendar table.
All integer epoch arithmetic (timezone-proof, exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: int,
    order_col: str | None = None,
) -> DataFrame:
    """(key, bucket_start, value) on a dense `step`-sized grid per key,
    spanning each key's [min, max] observed bucket, forward-filled.

    `ts_col` must be an integer epoch (any unit; `step` in the same unit).
    Ties inside a bucket resolve by (ts, order_col) — pass a unique
    `order_col` for deterministic last-observation-wins.
    """
    bucket = F.floor(F.col(ts_col) / F.lit(step)).alias("__bucket")
    order_cols = [F.col(ts_col).desc()] + (
        [F.col(order_col).desc()] if order_col else []
    )
    w_last = Window.partitionBy(key_col, "__bucket").orderBy(*order_cols)
    last_per_bucket = (
        df.select(key_col, ts_col, value_col, bucket, *([order_col] if order_col else []))
        .withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(key_col, "__bucket", F.col(value_col).alias("__obs"))
    )
    grid = (
        last_per_bucket.groupBy(key_col)
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(key_col, F.explode(F.sequence("__lo", "__hi")).alias("__bucket"))
    )
    joined = grid.join(last_per_bucket, on=[key_col, "__bucket"], how="left")
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key_col),
        (F.col("__bucket") * F.lit(step)).alias("bucket_start"),
        F.last("__obs", ignorenulls=True).over(w_fill).alias(value_col),
    )


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Build a Type-2 slowly-changing dimension from change events.

    Each change row becomes a half-open validity interval
    ``[valid_from, valid_to)``; the latest version per key has
    ``valid_to IS NULL`` and ``is_current = 1``. Input must be unique per
    (key, ts) — pre-aggregate ties upstream for determinism.

    One shuffle on the key (the LEAD window); interval construction is a
    narrow window function, so dimension history builds scale with change
    volume, not snapshot volume — the whole point of SCD2 over daily full
    snapshots.
    """
    w = Window.partitionBy(key_col).orderBy("valid_from")
    return (
        changes.select(key_col, *attr_cols, F.col(ts_col).alias("valid_from"))
        .withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn("is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0))
    )


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version valid
    at its timestamp (``valid_from <= ts < valid_to``, open-ended current).

    The key equality makes this a plain hash join with the interval test as
    a residual predicate — no interval explosion, no nested loop. Facts
    before a key's first version drop out (inner semantics).
    """
    cond = (
        (facts[key_col] == dim[key_col])
        & (dim["valid_from"] <= facts[fact_ts_col])
        & (dim["valid_to"].isNull() | (facts[fact_ts_col] < dim["valid_to"]))
    )
    return facts.join(dim, cond).drop(dim[key_col])
