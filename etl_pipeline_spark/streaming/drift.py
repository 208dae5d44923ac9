"""Streaming drift monitoring: windowed value histograms + PSI scoring.

The batch query `sql_drift_psi_event_values` (oracle-checked) defines the
semantics: equal-width bins over a fixed [lo, hi) range, Laplace-smoothed
probabilities, PSI = Σ (p_ref − p_cur)·ln(p_ref / p_cur). This module
maintains the *current* histogram incrementally with Structured Streaming
— state per trigger is |windows × types × bins| rows, independent of event
volume — and scores any window slice against a broadcast reference
histogram with the formula written identically to the SQL text.

At 100 TB/day this is the shape that works: the stream never retains rows
(bin counts are additive, partial aggregation absorbs volume), the
reference histogram is KBs (broadcast), and PSI itself is arithmetic over
bins. Alert logic is a filter on the PSI column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bin_expr(value_col: str, lo: float, hi: float, nbins: int) -> F.Column:
    """Equal-width bin id over a fixed range, clamped to [0, nbins-1] —
    textually the same binning as the batch PSI query."""
    width = (hi - lo) / nbins
    return F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")),
    ).cast("int")


def value_histogram(
    stream: DataFrame,
    lo: float,
    hi: float,
    nbins: int = 10,
    window: str = "6 hours",
    watermark: str = "1 hour",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Windowed equal-width histogram per key — the streaming side of drift
    monitoring: (win_start_epoch, key, bin, n)."""
    return (
        stream.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window),
            F.col(key_col),
            bin_expr(value_col, lo, hi, nbins).alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_epoch"),
            key_col,
            "bin",
            "n",
        )
    )


def psi_score(cur: DataFrame, ref: DataFrame, key_col: str = "event_type") -> DataFrame:
    """PSI per key of a current histogram against a reference histogram.

    Both inputs are (key, bin, n). Bins absent on one side enter with count
    0 (full outer join — bin-count-sized on both sides, so the shuffle is
    KBs regardless of event volume) and stay finite through the same
    Laplace smoothing as the batch query: (n + 0.5) / (total + 0.5·nbins).
    Output: (key, psi, n_bins).
    """
    c = cur.groupBy(key_col, "bin").agg(F.sum("n").alias("n_cur"))
    r = ref.groupBy(key_col, "bin").agg(F.sum("n").alias("n_ref"))
    joined = c.join(r, [key_col, "bin"], "full_outer").select(
        key_col,
        "bin",
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
    )
    tot = joined.groupBy(key_col).agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count(F.lit(1)).alias("nbins"),
    )
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 0.5 * F.col("nbins"))
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 0.5 * F.col("nbins"))
    return (
        joined.join(F.broadcast(tot), key_col)
        .groupBy(key_col)
        .agg(
            F.round(F.sum((p_ref - p_cur) * F.log(p_ref / p_cur)), 6).alias("psi"),
            F.max("nbins").cast("bigint").alias("n_bins"),
        )
    )
