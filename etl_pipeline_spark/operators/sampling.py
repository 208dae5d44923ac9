"""Deterministic hash-based sampling and train/valid/test splits.

A training-data pipeline must be able to re-derive *exactly* the same
split two years later from the same inputs — so splits can't use
`rand()`/`sampleBy` (seed + partitioning dependent, engine-specific).
Instead: bucket = first 32 bits of md5(seed || ':' || id), a pure column
expression that is engine-portable (the same SQL text evaluates in Spark
and DuckDB), partitioning-independent, and a narrow transform — splitting
100 TB costs zero shuffles.

The reference has no sampling at all (its closest analog is the 10-row
geometry sniff, SURVEY §2.9 bug 5 — replaced here by full-data operators);
this module is beyond-reference north-star surface.

- ``assign_splits``: label each row train/valid/test by cumulative weight
  over the hash bucket. Mutually exclusive, exhaustive, stable under
  corpus growth (a row's label never changes when other rows are added —
  unlike percentile-based splits).
- ``stratified_sample``: per-stratum keep-rates (e.g. downsample dominant
  languages) as a CASE over the same bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_u32_sql(id_expr: str, seed: str) -> str:
    """SQL for a deterministic uint32 from md5(seed:id).

    Decodes the first 8 hex chars via instr-arithmetic — evaluates
    identically in Spark SQL and DuckDB (no conv()/from_hex divergence).

    NULL ids hash via a sentinel (r11 nulls probe): Spark's concat
    propagates NULL (md5 → NULL → NaN noise downstream) while DuckDB's
    concat SKIPS NULL arguments (hashing just the seed) — the engines
    disagreed on every NULL-key group. coalesce to a fixed token gives
    both engines one deterministic draw for the missing-key group.
    """
    h = (
        f"md5(concat('{seed}', ':',"
        f" coalesce(CAST({id_expr} AS STRING), '__null__')))"
    )
    decoded = " + ".join(
        f"CAST(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({decoded})"


def hash_bucket_sql(id_expr: str, seed: str, buckets: int = _BUCKETS) -> str:
    """SQL for a deterministic bucket in [0, buckets) from md5(seed:id)."""
    return f"({hash_u32_sql(id_expr, seed)} % {buckets})"


def split_label_sql(id_expr: str, seed: str, weights: dict[str, float]) -> str:
    """SQL CASE assigning split labels by cumulative weight over the bucket."""
    total = sum(weights.values())
    bucket = hash_bucket_sql(id_expr, seed)
    arms, cum = [], 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        arms.append(f"WHEN {bucket} < {int(round(cum * _BUCKETS))} THEN '{name}'")
    return f"CASE {' '.join(arms)} ELSE '{items[-1][0]}' END"


def assign_splits(
    df: DataFrame, id_col: str, weights: dict[str, float], seed: str = "split"
) -> DataFrame:
    """Add deterministic `bucket` and `split` columns; no shuffle."""
    return df.withColumn(
        "bucket", F.expr(hash_bucket_sql(id_col, seed)).cast("int")
    ).withColumn("split", F.expr(split_label_sql(id_col, seed, weights)))


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, rates: dict[str, float],
    default_rate: float = 0.0, seed: str = "sample",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically by id hash."""
    bucket = hash_bucket_sql(id_col, seed)
    arms = " ".join(
        f"WHEN '{s}' THEN {int(round(r * _BUCKETS))}" for s, r in rates.items()
    )
    thresh = f"CASE {stratum_col} {arms} ELSE {int(round(default_rate * _BUCKETS))} END"
    return df.filter(F.expr(f"{bucket} < {thresh}"))


def weighted_sample_key_sql(id_expr: str, weight_expr: str, seed: str) -> str:
    """SQL for an Efraimidis–Spirakis weighted-sampling key.

    key = -ln(u) / w with u ~ Uniform(0,1) derived from md5(seed:id); the
    k rows with the SMALLEST keys are a weighted sample without
    replacement (equivalent to top-k by u^(1/w)). Deterministic and
    engine-portable: u is exact integer arithmetic; ln/division are IEEE
    doubles whose sub-ulp engine differences only matter on an exact tie
    at the k-boundary (probability ~0 for distinct ids).

    Non-positive weights map to key = +Infinity ("never sampled" — the
    ES limit as w→0⁺; zero-probability rows fill trailing slots only when
    fewer than k positive-weight rows exist). Without the guard a zero
    weight CRASHES Spark under ANSI (DIVIDE_BY_ZERO) while DuckDB quietly
    returns ±inf — found by the randomized-fixture sweep on an empty
    document (n_chars = 0). Callers ordering by this key should add the
    id as a tie-break so the all-infinity tail is deterministic.
    """
    u = f"((CAST({hash_u32_sql(id_expr, seed)} AS DOUBLE) + 0.5) / 4294967296.0)"
    w = f"CAST({weight_expr} AS DOUBLE)"
    return (
        f"(CASE WHEN {w} <= 0.0 THEN CAST('Infinity' AS DOUBLE) "
        f"ELSE (-LN({u}) / {w}) END)"
    )


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int, seed: str = "wsample"
) -> DataFrame:
    """Weighted sample of k rows without replacement (weight <= 0 → the
    row is effectively unsampleable: key +Infinity, trailing slots only).

    Scale: the key is a narrow expression; top-k by smallest key is
    Spark's TakeOrdered (per-partition k then a k-sized driver merge) —
    no full sort, no shuffle of the data itself. The id tie-break makes
    the selection deterministic even among equal keys (the +inf tail).
    """
    key = F.expr(weighted_sample_key_sql(id_col, weight_col, seed))
    return (
        df.withColumn("__wkey", key)
        .orderBy("__wkey", F.col(id_col).asc())
        .limit(k)
        .drop("__wkey")
    )
