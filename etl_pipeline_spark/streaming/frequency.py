"""Streaming frequency estimation: windowed count-min sketch cells.

Per-key exact counts need state proportional to the number of distinct
keys per window — unbounded for unbounded key spaces. The CMS cell
relation is an incremental streaming aggregate (counts sum), so
Structured Streaming maintains (window, d, bucket) -> cnt with state
bounded by |windows × depth × width| rows at any event volume, and the
watermark drops windows past the lateness budget.

Reading estimates is batch arithmetic over the drained cells
(`operators/sketch.py::cms_estimate` shape: min over depth rows), and
cells streamed per-window equal a batch `cms_build` over the same slice
exactly (asserted in test_streaming.py) — the same batch-pins-streaming
discipline as `streaming/cardinality.py` (HLL) and `streaming/drift.py`
(histograms). Together the three cover the streaming sketch family:
frequency / cardinality / distribution.

Hashing is the digest-chunk family of the batch sketch (one md5 per
event for depth ≤ 4), projected below the stateful aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.sketch import (
    _CHUNKS_PER_MD5,
    _digest_sql,
    digest_chunk_sql,
)


def windowed_cms_cells(
    stream: DataFrame,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 1024,
    window: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Windowed CMS cell relation: (win_start_epoch, d, bucket, cnt)."""
    key_sql = f"CAST({key_col} AS STRING)"
    n_groups = (depth + _CHUNKS_PER_MD5 - 1) // _CHUNKS_PER_MD5
    hashed = stream.withWatermark("event_time", watermark).select(
        "event_time",
        *[F.expr(_digest_sql(key_sql, g)).alias(f"m{g}") for g in range(n_groups)],
    )
    cells = hashed.select(
        "event_time",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(digest_chunk_sql(d, width)).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("event_time", "cell.d", "cell.bucket")
    return (
        cells.groupBy(F.window("event_time", window), "d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_epoch"),
            "d",
            "bucket",
            "cnt",
        )
    )
