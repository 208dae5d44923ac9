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


def range_bucketed_rank(
    df: DataFrame,
    key: str,
    *,
    ascending: bool = True,
    tiebreak: tuple[str, ...] = (),
    value_col: str | None = None,
    partition_cols: tuple[str, ...] = (),
    n_buckets: int = 1024,
    with_rank: bool = False,
    with_row_number: bool = False,
    dedupe_input: bool = False,
) -> DataFrame:
    """Value-ordered window stats WITHOUT a single-partition global sort.

    The same two-level scan as :func:`exclusive_prefix_sum`, generalized
    from unique-integer ids to an arbitrary numeric sort key: rows are
    range-bucketed by ``key`` (bucket = monotone function of the key, so
    bucket order == key order and ties never straddle buckets), per-bucket
    counts/sums aggregate into a SMALL totals relation (#partitions ×
    n_buckets rows), exclusive offsets come from one bounded window over
    that relation, and the big relation only ever sorts WITHIN a bucket
    (``PARTITION BY bucket`` — parallel across buckets). This replaces
    the ``SUM(x) OVER (ORDER BY key)`` / ``ROW_NUMBER() OVER (ORDER BY
    key)`` single-task plans that cannot run over an entity-cardinality
    relation at 100 TB (10⁸ customers / 10⁹ parts).

    Adds, per requested flag:
    - ``cum``   (``value_col``): inclusive running SUM of ``value_col`` in
      (key, tiebreak) order. Exact (order-free) for integer values;
      for doubles the bucketed accumulation order differs from a strict
      sequential scan by ~1 ulp — callers follow the repo parity rule of
      rounding before any threshold compare.
    - ``rnk``   (``with_rank``): RANK() by key alone — ties share the min
      rank (equal keys always co-bucket, so offset + local rank is the
      global rank). Also adds ``n_part`` = partition row count (for
      percent_rank = (rnk-1)/(n_part-1)).
    - ``rn``    (``with_row_number``): ROW_NUMBER() by (key, tiebreak).

    ``partition_cols`` supports LOW-cardinality grouping (e.g. the ~5
    event types): bounds and offsets are broadcast per group. For
    high-cardinality partition keys a plain partitioned window is already
    the right plan — don't use this device there.

    Skew note: all rows with one identical key value land in one bucket
    by construction (required for rank correctness); a single dominant
    value therefore bounds parallelism exactly as it would bound any
    correct ranking scheme.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    pc = list(partition_cols)

    # The input is consumed by three lineages below (bounds, the bucketed
    # rows, the per-bucket totals) whose differing column prunings defeat
    # exchange reuse — each lineage re-runs the caller's build. When that
    # build is a fact-scan + aggregate down to an ENTITY-cardinality
    # relation, one lazy localCheckpoint materializes it once, distributed,
    # and saves two fact scans (guide §5: cache when reused and recompute
    # is the expensive part; the profiler showed two full lineitem scans
    # per abc_xyz execution). Opt-in per call site: a caller whose input
    # IS the fact relation (quantile_normalize_values) must not pay a
    # fact-sized materialization for two saved scans, and checkpointing
    # there would also hide the scan's pushed filters from the plan.
    if dedupe_input:
        df = df.localCheckpoint(eager=False)

    def _nullsafe_join(left: DataFrame, right: DataFrame, cols: list[str]) -> DataFrame:
        # PARTITION BY groups NULL keys together, so the broadcast joins
        # back to the per-partition relations must too — a plain equi-join
        # silently DROPS NULL-key partitions (r11 nulls probe: the
        # NULL-segment customer vanished from the Spark ranking while the
        # oracle window kept it)
        r = right
        for c in cols:
            r = r.withColumnRenamed(c, f"__j_{c}")
        cond = None
        for c in cols:
            e = F.col(c).eqNullSafe(F.col(f"__j_{c}"))
            cond = e if cond is None else cond & e
        return left.join(F.broadcast(r), cond).drop(*[f"__j_{c}" for c in cols])

    kd = F.col(key).cast("double")
    bounds = (
        df.groupBy(*pc).agg(F.min(kd).alias("__lo"), F.max(kd).alias("__hi"))
        if pc
        else df.agg(F.min(kd).alias("__lo"), F.max(kd).alias("__hi"))
    )
    rows = (
        _nullsafe_join(df, bounds, pc)
        if pc
        else df.crossJoin(F.broadcast(bounds))
    )
    # floor((k - lo)/w) is monotone non-decreasing in k and constant on
    # ties, so bucket order == key order; clamp the hi endpoint into the
    # last bucket. Degenerate all-equal groups collapse to bucket 0.
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    bucket = (
        F.when(F.col("__hi") <= F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((kd - F.col("__lo")) / width),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
    )
    rows = rows.withColumn("__bucket", bucket).drop("__lo", "__hi")

    aggs = [F.count(F.lit(1)).alias("__cnt")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("__vtot"))
    totals = rows.groupBy(*pc, "__bucket").agg(*aggs)

    # SMALL relation (#groups × n_buckets): the bounded window — see
    # exclusive_prefix_sum docstring for why this is the safe place to sort.
    border = F.asc("__bucket") if ascending else F.desc("__bucket")
    base = Window.partitionBy(*pc) if pc else Window.partitionBy()
    off_w = base.orderBy(border).rowsBetween(Window.unboundedPreceding, -1)
    off_cols = [
        *pc,
        "__bucket",
        F.coalesce(F.sum("__cnt").over(off_w), F.lit(0)).alias("__coff"),
    ]
    if value_col is not None:
        off_cols.append(
            F.coalesce(F.sum("__vtot").over(off_w), F.lit(0)).alias("__voff")
        )
    if with_rank:
        # whole-group row count (order-independent frame)
        off_cols.append(
            F.sum("__cnt")
            .over(
                base.orderBy(border).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("__n")
        )
    offsets = totals.select(*off_cols)

    out = _nullsafe_join(rows, offsets, [*pc, "__bucket"])
    key_ord = F.asc(key) if ascending else F.desc(key)
    intra = Window.partitionBy(*pc, "__bucket")
    if value_col is not None:
        w_cum = intra.orderBy(key_ord, *[F.asc(t) for t in tiebreak]).rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = out.withColumn(
            "cum", F.col("__voff") + F.sum(value_col).over(w_cum)
        )
    if with_rank:
        w_rank = intra.orderBy(key_ord)
        out = out.withColumn(
            "rnk", F.col("__coff") + F.rank().over(w_rank)
        ).withColumnRenamed("__n", "n_part")
    if with_row_number:
        w_rn = intra.orderBy(key_ord, *[F.asc(t) for t in tiebreak])
        out = out.withColumn("rn", F.col("__coff") + F.row_number().over(w_rn))
    drop = ["__bucket", "__coff"]
    if value_col is not None:
        drop.append("__voff")
    return out.drop(*drop)


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
