"""Declarative data-quality expectations → violation relations.

The reference validates imperatively and logs (mapping alnum/length checks
`etl/mapping.py:242-268`, pre-load Exists/GetCount `etl/pipeline.py:633-651`,
WGS84 plausibility sniffing `etl/handlers/ogc_api.py:621-656`); the engine
form is: each expectation is a DataFrame producing the rows that VIOLATE it
— composable, countable, writable to a quarantine table, and (being plain
plans) fully pushdown/prune-optimized by Catalyst.

Scale: every check is one scan + (for uniqueness/FK) one keyed shuffle or
broadcast anti join — no collect, no sampling. Run all checks in one pass
with `union_violations` (one job, shared scan via Spark's plan reuse).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_not_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows where any of `cols` is NULL."""
    cond = None
    for c in cols:
        cnd = F.col(c).isNull()
        cond = cnd if cond is None else (cond | cnd)
    if cond is None:
        raise ValueError("check_not_null requires at least one column")
    return df.filter(cond)


def check_unique(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """All rows participating in a duplicated key (shuffle on the key; at
    scale identical cost to the exact-dedup operator)."""
    if not key_cols:
        raise ValueError("check_unique requires at least one key column")
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    dups = counts.filter(F.col("__n") > 1).drop("__n")
    return df.join(dups, on=list(key_cols), how="leftsemi")


def check_foreign_key(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Child rows whose key has no parent (anti join; broadcast when the
    parent is a dimension). NULL child keys are not FK violations (SQL
    semantics) — catch those with check_not_null."""
    parents = parent.select(F.col(parent_key).alias("__pk")).dropDuplicates()
    return child.filter(F.col(child_key).isNotNull()).join(
        parents, child[child_key] == F.col("__pk"), "leftanti"
    )


def check_range(df: DataFrame, predicate: Column) -> DataFrame:
    """Rows violating a row-level predicate (pass the EXPECTED condition)."""
    return df.filter(~predicate)


def union_violations(named_checks: dict[str, DataFrame], id_col: str) -> DataFrame:
    """One violations relation: (check, id) per violating row — the
    quarantine/reporting shape. Checks may come from different tables; only
    the id column is kept so the union is schema-stable."""
    out: DataFrame | None = None
    for name, v in named_checks.items():
        part = v.select(
            F.lit(name).alias("check"), F.col(id_col).cast("bigint").alias("row_id")
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("union_violations requires at least one check")
    return out
