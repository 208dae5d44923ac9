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


def clicks_before_purchases(
    stream: DataFrame,
    lookback: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Inner interval join: each purchase with every same-user click in the
    preceding `lookback`. Returns (purchase_id, user_id, purchase_time,
    click_time, click_value) — aggregate downstream per purchase_id.

    `watermark_delay` is the lateness budget; click state is held for
    delay + lookback before eviction.
    """
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", watermark_delay)
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_time").alias("click_time"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_time", watermark_delay)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"p_user = c_user AND "
            f"click_time BETWEEN purchase_time - INTERVAL {lookback} AND purchase_time"
        ),
        "inner",
    ).select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_time",
        "click_time",
        "click_value",
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
