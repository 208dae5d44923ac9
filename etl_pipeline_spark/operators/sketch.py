"""Count-min sketch: mergeable frequency estimation as a relation.

Exact per-key counts (`groupBy(key).count()`) shuffle every distinct key;
when the key space is unbounded (URLs, n-grams, user agents at 100 TB) the
sketch caps the state at depth × width cells regardless of cardinality:

- build: each row hashes into one bucket per depth row → a (d, bucket)
  aggregate. Partial aggregation absorbs row volume, the shuffle carries at
  most depth × width cells per task.
- merge: sketches are counters → union + re-aggregate (used for
  incremental/streaming maintenance).
- estimate: point frequency = min over depth rows of the key's cell — an
  overestimate with error ≤ e·N/width at probability 1-(1/e)^depth
  (Cormode & Muthukrishnan, J. Algorithms 2005).

Hashing is seeded md5 (hex-decoded to BIGINT via the same instr chain the
SimHash query uses) — no engine-specific hash builtin, so build and
estimate evaluate identically in Spark and DuckDB and the whole pipeline
is oracle-checkable cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hex8_expr(inner: str) -> str:
    """SQL decoding the first 8 md5 hex chars of `inner` to a BIGINT."""
    digits = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({inner}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({digits})"


def _bucket_expr(key_sql: str, d: int, width: int) -> str:
    inner = "concat('" + str(d) + ":', " + key_sql + ")"
    return f"{hex8_expr(inner)} % {width}"


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Build the sketch relation (d, bucket, cnt) over a key column.

    One explode (depth rows per input row, a narrow op) + one aggregation
    whose output is ≤ depth × width rows — the fixed-size summary that
    replaces an unbounded distinct-key shuffle.
    """
    key_sql = f"CAST({key_col} AS STRING)"
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(_bucket_expr(key_sql, d, width)).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(cells)
        .select("cell.d", "cell.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): sum cells."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Estimated frequency per probe key: min over depth rows of the key's
    cell. The sketch is broadcast (≤ depth × width rows); probing is a
    map-side join however many keys are probed."""
    key_sql = f"CAST({key_col} AS STRING)"
    probe_cells = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.expr(_bucket_expr(key_sql, d, width)).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.d", "cell.bucket")
    return (
        probe_cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .select(key_col, F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est"))
    )


# --------------------------------------------------------------------------
# Bloom filter as a relation — the explicit form of runtime join pruning:
# build over the (selective) build-side key set, pre-filter the probe
# side's DISTINCT keys, semi-join survivors back. False positives only
# cost wasted probe rows; no true key is ever dropped (test-pinned).
# Same seeded-md5 position hashing as the CMS → oracle-checkable.
# --------------------------------------------------------------------------


def bloom_position_sql(key_sql: str, i: int, m: int) -> str:
    """SQL for the i-th Bloom bit position of a key expression."""
    inner = "'" + str(i) + ":' || " + key_sql
    return f"{hex8_expr(inner)} % {m}"


def _positions(key_sql: str, k: int, m: int):
    return [F.expr(bloom_position_sql(key_sql, i, m)) for i in range(k)]


def bloom_build(df: DataFrame, key_col: str, m: int = 16384, k: int = 3) -> DataFrame:
    """Set-position relation (pos) of the Bloom filter over a key column —
    at most m rows however many keys are inserted; mergeable by union."""
    key_sql = f"CAST({key_col} AS STRING)"
    pos = F.explode(F.array(*_positions(key_sql, k, m))).alias("pos")
    return df.select(pos).distinct()


def bloom_check(
    probes: DataFrame, bloom: DataFrame, key_col: str, m: int = 16384, k: int = 3
) -> DataFrame:
    """Probe keys annotated with bloom membership (`maybe_member` = every
    one of the k positions is set). The bloom relation broadcasts (≤ m
    rows); checking is a map-side join per position + one count-match
    aggregate over k rows per key."""
    key_sql = f"CAST({key_col} AS STRING)"
    cells = probes.select(
        key_col, F.explode(F.array(*_positions(key_sql, k, m))).alias("pos")
    )
    hits = (
        cells.join(F.broadcast(bloom.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg((F.sum(F.coalesce("hit", F.lit(0))) == k).cast("int").alias("maybe_member"))
    )
    return hits
