"""Stream-stream joins (Structured Streaming, beyond-reference).

The batch semantics are `range_join_click_attribution` in
plans/streaming_batch.py (DuckDB-oracle-checked); this module is the live
form: two watermarked streams inner-joined on an equi key plus an event-
time interval. Spark keeps both sides in state and evicts rows once the
watermark passes the interval bound — the state-bounding that makes the
join runnable forever at 100 TB/day.

The interval condition (`c_time BETWEEN p_time - lookback AND p_time`)
must reference the *event-time* columns of both sides so the planner can
derive state-eviction thresholds (unbounded state otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def same_user_interval_pairs(
    stream: DataFrame,
    left_type: str,
    right_types: tuple[str, ...],
    horizon_ns: int,
    watermark_delay: str = "2 hours",
    strict_upper: bool = False,
) -> DataFrame:
    """Watermarked same-user interval join: each `left_type` event with
    every same-user `right_types` event in the preceding ``horizon_ns``.

    The event-time join condition (µs precision, horizon rounded UP so
    the prefilter is never narrower than the residual) is what lets
    Spark derive state-eviction thresholds — state is held for
    watermark_delay + horizon; the EXACT bound runs as a residual on the
    int64-ns ``ts`` payload: ``tp - horizon_ns <= tt < tp`` when
    ``strict_upper`` else ``<= tp``. Returns
    (p_id, user_id, tp, p_time, t_id, event_type, tt, t_time, t_value).
    """
    horizon_us = -(-horizon_ns // 1000)  # ceil: prefilter ⊇ residual
    left = (
        stream.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("tp"),
            F.col("event_time").alias("p_time"),
        )
        .withWatermark("p_time", watermark_delay)
    )
    right = (
        stream.filter(F.col("event_type").isin(*right_types))
        .select(
            F.col("event_id").alias("t_id"),
            F.col("user_id").alias("t_user"),
            F.col("event_type").alias("event_type"),
            F.col("ts").alias("tt"),
            F.col("event_time").alias("t_time"),
            F.col("value").alias("t_value"),
        )
        .withWatermark("t_time", watermark_delay)
    )
    upper = (
        (F.col("tt") < F.col("tp"))
        if strict_upper
        else (F.col("tt") <= F.col("tp"))
    )
    return (
        left.join(
            right,
            F.expr(
                f"p_user = t_user AND t_time BETWEEN "
                f"p_time - INTERVAL {horizon_us} MICROSECOND AND p_time"
            ),
            "inner",
        )
        .filter(upper & (F.col("tt") >= F.col("tp") - F.lit(horizon_ns)))
        .select(
            "p_id",
            F.col("p_user").alias("user_id"),
            "tp",
            "p_time",
            "t_id",
            "event_type",
            "tt",
            "t_time",
            "t_value",
        )
    )


_HOUR_NS = 3_600_000_000_000


def clicks_before_purchases(
    stream: DataFrame,
    lookback_ns: int = _HOUR_NS,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Inner interval join: each purchase with every same-user click in the
    preceding `lookback_ns` (closed bounds, ns-exact — the same pair set
    as the batch ``bucketed_interval_join(-lookback_ns, 0)``). Returns
    (purchase_id, user_id, purchase_time, click_time, click_value) —
    aggregate downstream per purchase_id.

    `watermark_delay` is the lateness budget; click state is held for
    delay + lookback before eviction.
    """
    return same_user_interval_pairs(
        stream,
        "purchase",
        ("click",),
        horizon_ns=lookback_ns,
        watermark_delay=watermark_delay,
        strict_upper=False,
    ).select(
        F.col("p_id").alias("purchase_id"),
        "user_id",
        F.col("p_time").alias("purchase_time"),
        F.col("t_time").alias("click_time"),
        F.col("t_value").alias("click_value"),
    )


def run_available_now_append(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain an append-mode stream (joins emit append-only) into a memory
    sink and return the materialized result (test/validation helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def enrich_with_dimension(
    stream: DataFrame, dim: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to each
    streaming row.

    The static side is broadcast — no streaming state at all (unlike
    stream-stream joins), and the dimension is re-resolved every
    micro-batch, so a slowly-changing dimension table picks up updates on
    the next trigger without restarting the query. This is the streaming
    twin of the reference's per-row source↔config lookups
    (etl/models.py:144-237) and the single most common production
    enrichment shape at any scale.
    """
    return stream.join(F.broadcast(dim), on, how)
