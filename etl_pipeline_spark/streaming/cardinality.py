"""Streaming distinct-count: windowed HyperLogLog registers.

COUNT(DISTINCT) is not expressible as an incremental streaming aggregate
(exact distinct needs unbounded per-window key state). The HLL register
relation is: max is an associative/commutative aggregate, so Structured
Streaming maintains (window, key, idx) -> rho_max with state bounded by
|windows × keys × 2^p| rows — independent of event volume. Reading the
estimate is batch arithmetic over the drained registers
(`operators/sketch.py::hll_estimate_grouped`), and registers streamed
per-window equal a batch `hll_build_grouped` over the same slice
exactly (asserted in test_streaming.py).

This is the streaming member of the sketch family next to
`streaming/drift.py` (histograms) — the "distinct users per hour at
100 TB/day" shape: partial aggregation absorbs row volume map-side, the
shuffle and the state store carry only register cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.sketch import hex8_expr, hll_cell_from_h


def windowed_hll_registers(
    stream: DataFrame,
    id_col: str = "user_id",
    p: int = 8,
    window: str = "6 hours",
    watermark: str = "1 hour",
    key_col: str = "event_type",
) -> DataFrame:
    """Windowed per-key HLL register relation:
    (win_start_epoch, key, idx, rho_max). One md5 per event: the hash is
    projected below the stateful aggregate and both cell coordinates
    decode from the projection."""
    idx, rho = hll_cell_from_h("h", p)
    return (
        stream.withWatermark("event_time", watermark)
        .withColumn("h", F.expr(hex8_expr(f"CAST({id_col} AS STRING)", fast=True)))
        .groupBy(
            F.window("event_time", window),
            F.col(key_col),
            F.expr(idx).alias("idx"),
        )
        .agg(F.max(F.expr(rho)).alias("rho_max"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_epoch"),
            key_col,
            "idx",
            "rho_max",
        )
    )
