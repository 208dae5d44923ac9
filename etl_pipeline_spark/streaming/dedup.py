"""Streaming deduplication — the training-data-pipeline operator on the
live surface (SURVEY.md §2.8 family; batch semantics defined by the
oracle-checked `dedup_exact_hash` / `distinct_dedupe` queries).

Two state disciplines, both built on Spark's streaming dedup operators:

- `dedup_stream_exact`: `dropDuplicates` on the key — state grows with
  the number of DISTINCT keys seen since the stream started. Right when
  the key space is bounded (ids within a replay window).
- `dedup_stream_within_watermark`: `dropDuplicatesWithinWatermark` —
  state is bounded by the watermark horizon: a key's state is dropped
  once the watermark passes it, so re-emissions separated by more than
  the lateness budget are treated as new. This is the 100 TB shape: at
  unbounded key cardinality only a bounded-horizon guarantee has bounded
  state.

Both emit the FIRST-seen row per key (append mode); the batch twin of
the exact variant is a min-by-key aggregate over the same slice, pinned
equal in test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream_exact(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """First row per key, unbounded state (distinct-key count)."""
    return stream.dropDuplicates(key_cols)


def dedup_stream_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    event_time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """First row per key with state bounded by the watermark horizon —
    duplicate suppression is guaranteed only within the lateness budget,
    which is exactly the trade that keeps state finite over an unbounded
    key space."""
    return stream.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
