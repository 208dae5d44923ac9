"""Single-pass data profiling: per-column nulls / distincts / ranges.

The reference validates data with scattered per-source checks
(`etl/pipeline.py:633-651` count-and-exists, `etl/mapping.py:242-268`
name rules); a data engine should offer table profiling as one operator.

Shape: ONE aggregation over the table computes every statistic (null
count, exact distinct count, numeric min/max as DOUBLE, string-length
min/max as DOUBLE) for every column simultaneously; the wide one-row
result is then unpivoted by a single ``stack`` generator (NOT a union of
per-column selects — column pruning would specialize each union branch
into its own aggregate and the table would be scanned once per column).
Multiple COUNT(DISTINCT)s expand to Spark's Expand-based partial-distinct
plan — a single scan and one shuffle regardless of column count, which is
the property that matters at 100 TB (naive per-column loops scan N times).

All four range stats are DOUBLE so NULL (not applicable for the type)
renders identically through pandas on both the Spark and DuckDB sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

def _null_d() -> F.Column:
    # built lazily: F.lit at module import would require an active session
    return F.lit(None).cast("double")


def profile(df: DataFrame) -> DataFrame:
    """One row per column: col_name, n_nulls, n_distinct, min_num,
    max_num, min_len, max_len."""
    aggs = []
    for field in df.schema.fields:
        c = field.name
        # COALESCE: an EMPTY relation has zero nulls, but SUM over empty
        # is NULL — the oracle's COUNT(*) FILTER form yields 0 (empty-
        # input probe, r11)
        aggs.append(
            F.coalesce(F.sum(F.isnull(c).cast("long")), F.lit(0)).alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if isinstance(field.dataType, NumericType):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max"))
        elif isinstance(field.dataType, StringType):
            aggs.append(F.min(F.length(c)).cast("double").alias(f"{c}__minlen"))
            aggs.append(F.max(F.length(c)).cast("double").alias(f"{c}__maxlen"))
    wide = df.agg(*aggs)

    args: list[F.Column] = []
    for field in df.schema.fields:
        c = field.name
        is_num = isinstance(field.dataType, NumericType)
        is_str = isinstance(field.dataType, StringType)
        args += [
            F.lit(c),
            F.col(f"{c}__nulls").cast("bigint"),
            F.col(f"{c}__distinct").cast("bigint"),
            F.col(f"{c}__min") if is_num else _null_d(),
            F.col(f"{c}__max") if is_num else _null_d(),
            F.col(f"{c}__minlen") if is_str else _null_d(),
            F.col(f"{c}__maxlen") if is_str else _null_d(),
        ]
    return wide.select(
        F.stack(F.lit(len(df.schema.fields)), *args).alias(
            "col_name", "n_nulls", "n_distinct", "min_num", "max_num", "min_len", "max_len"
        )
    )
