"""Scan fan-out for unsplittable inputs.

The star-schema tables arrive as one parquet file with ONE row group each,
so a scan yields exactly one input split no matter what
``spark.sql.files.maxPartitionBytes`` / ``minPartitionNum`` say — parquet
cannot split below the row-group. Any query whose scan stage carries real
per-row compute (md5 digest families, shingle explosions, Arrow kernel
passes, candidate fan-outs) then runs that compute on ONE core while the
rest of the session idles: the guide's §2.5 "input skew: one huge
unsplittable file … repartition immediately after the read".

``fan_out_scan`` is that repartition, made scale-adaptive instead of
unconditional: when the plan already carries at least the session's
default parallelism (a cluster reading thousands of splits), it is a
no-op; only a scan narrower than the session's cores pays the one
round-robin exchange of the (already projected, narrow) rows. Round-robin
keeps determinism under retries via Spark's sort-before-repartition
(SPARK-23207, on by default); callers only apply it above partition-
order-insensitive computation (per-row kernels, exact-lattice/int/min/max
aggregates), which is this repo's aggregate convention anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's parallelism iff the
    current plan is narrower; identity on already-parallel plans."""
    sc = df.sparkSession.sparkContext
    target = int(parts or sc.defaultParallelism)
    if target <= 1:
        return df
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning hiccup: fail open, repartition
        current = 0
    if current >= target:
        return df
    return df.repartition(target)
