"""Sequence packing: assign rows to fixed token-budget training sequences.

The GPT-style pretraining data layout concatenates the token stream in a
deterministic document order and slices it into fixed-size blocks; the
sequence id of a document is ``floor(exclusive_prefix_sum(tokens) /
budget)``. The primitive underneath is a distributed prefix sum.

A naive Spark expression — ``SUM(n) OVER (ORDER BY id)`` with no
PARTITION BY — collapses the whole corpus into ONE window partition
(single task, driver-adjacent memory), which is exactly the plan you
cannot run at 100 TB. Instead we use the textbook two-level scan:

1. bucket rows by ``id DIV bucket_width`` (narrow, no shuffle);
2. aggregate per-bucket totals (one shuffle over ~n/bucket_width rows);
3. exclusive-cumsum the bucket totals with a window over that SMALL
   relation (single partition over thousands of rows, not billions);
4. broadcast the bucket offsets back and window-cumsum WITHIN each
   bucket (``PARTITION BY bucket`` — parallel across buckets).

Result: the only global ordering ever materialized in one place is the
bucket-total relation, whose size is corpus/bucket_width. With 4096 rows
per bucket, a 10-billion-document corpus yields a 2.4M-row offset table —
still a single cheap window. (For truly unbounded inputs you'd recurse the
same trick once more.)

Reference parity: the reference has no packing operator (its unit of work
is a whole feature-class, reference: etl/pipeline.py run loop); this is a
beyond-reference operator from the LLM-training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    id_col: str,
    size_col: str,
    bucket_width: int = 4096,
) -> DataFrame:
    """Add ``cum_excl`` = sum of `size_col` over all rows with smaller id.

    `id_col` must be unique non-negative integers (the deterministic
    corpus order). Output keeps all input columns.
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    # integer DIV, not double division: (id / w).cast('bigint') loses
    # exactness for ids >= 2^53 (the 10B+-row regime this targets); ids
    # are documented non-negative so DIV == floor
    bucket = F.expr(f"{id_col} DIV {bucket_width}").alias("__bucket")
    rows = df.withColumn("__bucket", bucket)

    totals = rows.groupBy("__bucket").agg(F.sum(size_col).alias("__bucket_total"))
    # SMALL relation (n / bucket_width rows): the single-partition window
    # here is deliberate and bounded — see module docstring.
    off_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__bucket_total").over(off_w), F.lit(0)).alias("__offset"),
    )

    intra_w = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        rows.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "cum_excl",
            F.col("__offset") + F.coalesce(F.sum(size_col).over(intra_w), F.lit(0)),
        )
        .drop("__bucket", "__offset")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    bucket_width: int = 4096,
) -> DataFrame:
    """Assign each row a ``seq_id`` = floor(cum_excl / budget).

    Concatenate-and-chunk packing: a row whose sizes straddle a budget
    boundary belongs to the sequence its first token lands in (the
    standard pretraining convention — the tail spills into the next
    block).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    with_cum = exclusive_prefix_sum(df, id_col, size_col, bucket_width)
    return with_cum.withColumn(
        "seq_id", F.expr(f"cum_excl DIV {budget}").cast("bigint")
    )
