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

Hashing is seeded md5 hex-decoded to BIGINT — no engine-specific hash
builtin, so build and estimate produce identical VALUES in Spark and
DuckDB and the whole pipeline is oracle-checkable cell-for-cell. Two
cost disciplines on top of that, both value-identical across dialects
(test-pinned):
- the i-th independent 32-bit hash is chunk i%4 of digest i//4 (a
  32-char md5 carries 4 disjoint 8-hex-char hashes), so a depth-4 CMS
  or k=3 Bloom pays ONE md5 per input row;
- decode differs per dialect: DuckDB oracles sum 8 instr() digit
  lookups (portable), Spark decodes in one builtin
  `CAST(conv(substr(digest, 8c+1, 8), 16, 10) AS BIGINT)` — and the
  digest is projected once BELOW any Generate node, where Spark's
  subexpression elimination does not apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_spark.utils.parallelism import fan_out_scan


def hex8_expr(inner: str, *, fast: bool = False) -> str:
    """SQL decoding the first 8 md5 hex chars of `inner` to a BIGINT.

    fast=True → Spark-only conv() decode (one md5 per occurrence);
    fast=False → engine-portable instr-chain decode (used by oracles).
    Both produce the same BIGINT for every input.
    """
    if fast:
        return f"CAST(conv(substr(md5({inner}), 1, 8), 16, 10) AS BIGINT)"
    digits = " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({inner}), {i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({digits})"


def hex8_from_col(hex_col: str) -> str:
    """Spark SQL decoding an already-projected 8-hex-char column to BIGINT.

    Use when the md5 can be computed once in a Project and decoded after a
    Generate/explode — zero md5 calls at the decode site."""
    return f"CAST(conv({hex_col}, 16, 10) AS BIGINT)"


# A 32-char md5 digest carries four disjoint 8-hex-char (32-bit) hashes.
# The i-th independent hash of a key is chunk i%4 of digest i//4, so n
# hash rows cost ceil(n/4) md5 evaluations — the same chunked-family
# trick the MinHash signatures use (operators/dedup.py).
_CHUNKS_PER_MD5 = 4


def _digest_sql(key_sql: str, group: int) -> str:
    """SQL for the group-th seeded md5 digest of a key expression."""
    return f"md5({key_sql})" if group == 0 else f"md5(concat('{group}:', {key_sql}))"


def hex8_at_expr(key_sql: str, chunk: int, *, fast: bool = False) -> str:
    """SQL decoding the chunk-th independent 32-bit hash of `key_sql` to
    BIGINT. fast=True → Spark conv() decode; fast=False → engine-portable
    instr chain (oracles). Both produce the same BIGINT."""
    g, c = divmod(chunk, _CHUNKS_PER_MD5)
    digest = _digest_sql(key_sql, g)
    if fast:
        return f"CAST(conv(substr({digest}, {8 * c + 1}, 8), 16, 10) AS BIGINT)"
    digits = " + ".join(
        f"CAST(instr('0123456789abcdef', substr({digest}, {8 * c + i + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({digits})"


def digest_chunk_sql(chunk: int, width: int, col_prefix: str = "m") -> str:
    """Spark SQL decoding the chunk-th hash from ALREADY-projected digest
    columns ({col_prefix}0, {col_prefix}1, …) to a bucket in [0, width) —
    the shared decode for CMS build/probe and the streaming CMS."""
    g, c = divmod(chunk, _CHUNKS_PER_MD5)
    return (
        f"CAST(conv(substr({col_prefix}{g}, {8 * c + 1}, 8), 16, 10) AS BIGINT)"
        f" % {width}"
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Build the sketch relation (d, bucket, cnt) over a key column.

    One explode (depth rows per input row, a narrow op) + one aggregation
    whose output is ≤ depth × width rows — the fixed-size summary that
    replaces an unbounded distinct-key shuffle. The depth hash rows are
    md5-digest chunks: ceil(depth/4) md5 calls per input row, projected
    once below the Generate (no subexpression elimination applies there).
    """
    key_sql = f"CAST({key_col} AS STRING)"
    n_groups = (depth + _CHUNKS_PER_MD5 - 1) // _CHUNKS_PER_MD5
    # the md5 family is the scan stage's real compute: fan the narrow key
    # projection out first so an unsplittable input doesn't serialize the
    # digest pass onto one core (guide §2.5; no-op on wide scans)
    hashed = fan_out_scan(df.select(key_col)).select(
        *[F.expr(_digest_sql(key_sql, g)).alias(f"m{g}") for g in range(n_groups)]
    )
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    F.expr(digest_chunk_sql(d, width)).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("cell")
    return (
        hashed.select(cells)
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
    n_groups = (depth + _CHUNKS_PER_MD5 - 1) // _CHUNKS_PER_MD5
    hashed = probes.select(
        key_col,
        *[F.expr(_digest_sql(key_sql, g)).alias(f"m{g}") for g in range(n_groups)],
    )
    probe_cells = hashed.select(
        key_col,
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


def bloom_position_sql(key_sql: str, i: int, m: int, *, fast: bool = False) -> str:
    """SQL for the i-th Bloom bit position of a key expression — the i-th
    digest chunk mod m (k positions cost ceil(k/4) md5 evaluations)."""
    return f"{hex8_at_expr(key_sql, i, fast=fast)} % {m}"


def _position_cols(key_col: str, k: int, m: int) -> tuple[list, list]:
    """(digest projections, position columns over them) for the Spark
    side: digests are projected once, positions decode chunks via conv()."""
    key_sql = f"CAST({key_col} AS STRING)"
    n_groups = (k + _CHUNKS_PER_MD5 - 1) // _CHUNKS_PER_MD5
    digests = [
        F.expr(_digest_sql(key_sql, g)).alias(f"m{g}") for g in range(n_groups)
    ]
    positions = [
        F.expr(digest_chunk_sql(i, m))
        for i in range(k)
    ]
    return digests, positions


def bloom_build(df: DataFrame, key_col: str, m: int = 16384, k: int = 3) -> DataFrame:
    """Set-position relation (pos) of the Bloom filter over a key column —
    at most m rows however many keys are inserted; mergeable by union."""
    digests, positions = _position_cols(key_col, k, m)
    return (
        df.select(*digests)
        .select(F.explode(F.array(*positions)).alias("pos"))
        .distinct()
    )


def bloom_check(
    probes: DataFrame, bloom: DataFrame, key_col: str, m: int = 16384, k: int = 3
) -> DataFrame:
    """Probe keys annotated with bloom membership (`maybe_member` = every
    one of the k positions is set). The bloom relation broadcasts (≤ m
    rows); checking is a map-side join per position + one count-match
    aggregate over k rows per key."""
    digests, positions = _position_cols(key_col, k, m)
    cells = probes.select(key_col, *digests).select(
        key_col, F.explode(F.array(*positions)).alias("pos")
    )
    hits = (
        cells.join(F.broadcast(bloom.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg((F.sum(F.coalesce("hit", F.lit(0))) == k).cast("int").alias("maybe_member"))
    )
    return hits


# --------------------------------------------------------------------------
# HyperLogLog as a relation — the cardinality member of the sketch
# family (CMS = frequency, Bloom = membership, HLL = distinct count).
# State is ≤ 2^p register rows however many keys stream in; merge is
# max-per-register, so shards/days/streams combine without re-scanning.
# rho is computed exactly from the binary length of the hash remainder
# (no floating log2), and every 2^-rho summand is an exact dyadic, so
# the raw estimator is bit-identical across engines and the whole
# pipeline value-hashes against a SQL recomputation.
# Flajolet et al., AofA 2007 ("HyperLogLog: the analysis of a
# near-optimal cardinality estimation algorithm").
# --------------------------------------------------------------------------


def hll_cell_sql(key_sql: str, p: int) -> tuple[str, str]:
    """(idx_sql, rho_sql): register index = low p hash bits; rho = leading
    zeros of the remaining 32-p bits + 1, via exact binary length."""
    m = 1 << p
    bits = 32 - p
    h = hex8_expr(key_sql)
    idx = f"({h} % {m})"
    rest = f"CAST(FLOOR({h} / {m}) AS BIGINT)"
    # TRIM(LEADING...) not two-arg LTRIM: Spark's ltrim(a, b) swaps the
    # argument order vs DuckDB's — the standard syntax parses identically
    rho = f"({bits} - LENGTH(TRIM(LEADING '0' FROM bin({rest}))) + 1)"
    return idx, rho


def hll_alpha(m: int) -> float:
    """Bias-correction constant for m registers (Flajolet et al. §4)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_cell_from_h(h_sql: str, p: int) -> tuple[str, str]:
    """(idx_sql, rho_sql) decoded from an ALREADY-projected BIGINT hash
    column/expression — the Spark fast path: the md5 is computed once in
    a Project below the Aggregate, and both cell coordinates read it.
    Value-identical to hll_cell_sql's embedded form (test-pinned)."""
    m = 1 << p
    bits = 32 - p
    idx = f"({h_sql} % {m})"
    rest = f"CAST(FLOOR({h_sql} / {m}) AS BIGINT)"
    rho = f"({bits} - LENGTH(TRIM(LEADING '0' FROM bin({rest}))) + 1)"
    return idx, rho


def hll_build(df: DataFrame, key_col: str, p: int = 8) -> DataFrame:
    """Register relation (idx, rho_max) — ≤ 2^p rows; the fixed-size
    cardinality summary. One narrow projection + one bounded aggregate.
    Exactly one md5 per input row: the hash is projected once and both
    cell coordinates decode from the projection."""
    key_sql = f"CAST({key_col} AS STRING)"
    idx, rho = hll_cell_from_h("h", p)
    return (
        df.select(F.expr(hex8_expr(key_sql, fast=True)).alias("h"))
        .select(F.expr(idx).alias("idx"), F.expr(rho).alias("rho"))
        .groupBy("idx")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge register relations built with the same p: max per register."""
    out = registers[0]
    for s in registers[1:]:
        out = out.unionByName(s)
    return out.groupBy("idx").agg(F.max("rho_max").alias("rho_max"))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Single-row (n_set, est): the raw HLL estimator
    alpha_m * m^2 / (sum over set registers of 2^-rho + one per empty
    register). No small-range (linear counting) or 32-bit large-range
    correction — callers stay in the raw band (n >> 2.5·m), which the
    registered query's tables satisfy and tests pin; every summand is an
    exact dyadic so the result is engine-bit-identical."""
    m = 1 << p
    alpha_m2 = hll_alpha(m) * m * m
    return (
        registers.agg(
            F.count(F.lit(1)).alias("n_set"),
            F.sum(F.expr("pow(2.0, -rho_max)")).alias("sum_set"),
        )
        .select(
            F.col("n_set").cast("bigint").alias("n_set"),
            (
                F.lit(alpha_m2)
                / (F.col("sum_set") + (F.lit(m) - F.col("n_set")))
            ).alias("est"),
        )
    )


def hll_build_grouped(
    df: DataFrame, group_cols: list[str], key_col: str, p: int = 8
) -> DataFrame:
    """Per-group register relation (*group_cols, idx, rho_max) — ≤ 2^p rows
    per group; the GROUP BY COUNT(DISTINCT) replacement. One md5 per row
    (hash projected once, decoded twice)."""
    key_sql = f"CAST({key_col} AS STRING)"
    idx, rho = hll_cell_from_h("h", p)
    return (
        df.select(*group_cols, F.expr(hex8_expr(key_sql, fast=True)).alias("h"))
        .select(*group_cols, F.expr(idx).alias("idx"), F.expr(rho).alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate_grouped(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Raw HLL estimate per group from a grouped register relation:
    (*group_cols, n_set, est). Same raw-band caveat as hll_estimate."""
    m = 1 << p
    alpha_m2 = hll_alpha(m) * m * m
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_set"),
            F.sum(F.expr("pow(2.0, -rho_max)")).alias("sum_set"),
        )
        .select(
            *group_cols,
            "n_set",
            (
                F.lit(alpha_m2)
                / (F.col("sum_set") + (F.lit(m) - F.col("n_set")))
            ).alias("est"),
        )
    )


def hll_est_sql(sum_expr: str, nset_expr: str, p: int) -> str:
    """SQL for the corrected HLL estimate from aggregate sub-expressions.

    Raw estimator in the high band; linear counting (m·ln(m/V), V = empty
    registers) below 2.5·m where the raw form is biased (Flajolet et al.
    §4). ROUND(.., 4) absorbs last-ulp libm LN differences across
    engines (the same discipline the PSI/entropy queries use).
    """
    m = 1 << p
    alpha_m2 = repr(hll_alpha(m) * m * m)
    raw = f"({alpha_m2} / ({sum_expr} + ({m} - {nset_expr})))"
    zeros = f"({m} - {nset_expr})"
    return (
        f"ROUND(CASE WHEN {raw} <= {repr(2.5 * m)} AND {zeros} > 0 "
        f"THEN {m} * LN({m} / CAST({zeros} AS DOUBLE)) "
        f"ELSE {raw} END, 4)"
    )


def hll_estimate_corrected_grouped(
    registers: DataFrame, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Corrected estimate per group: (*group_cols, n_set, est) — accurate
    from n ≈ 1 (linear counting) through the raw band, so it serves
    low-cardinality columns (statuses) and high ones (keys) alike."""
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_set"),
        F.sum(F.expr("pow(2.0, -rho_max)")).alias("sum_set"),
    )
    return agg.select(
        *group_cols,
        "n_set",
        F.expr(hll_est_sql("sum_set", "n_set", p)).alias("est"),
    )


def hll_estimate_corrected(registers: DataFrame, p: int = 8) -> DataFrame:
    """Single-row corrected estimate (n_set, est) — the scalar form of
    hll_estimate_corrected_grouped."""
    agg = registers.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_set"),
        F.sum(F.expr("pow(2.0, -rho_max)")).alias("sum_set"),
    )
    return agg.select(
        "n_set", F.expr(hll_est_sql("sum_set", "n_set", p)).alias("est")
    )


# --------------------------------------------------------------------------
# Histogram-quantile sketch — the QUANTILE member of the sketch family
# (CMS = frequency, HLL = cardinality, this = quantiles). Exact quantiles
# need a global sort (or percentile's full value buffer per group); the
# equal-width histogram is a mergeable bounded-state summary — ≤ `bins`
# cells whatever the row count, cells from disjoint slices merge by
# summing — and a quantile is linear interpolation inside the covering
# bin. Deterministic arithmetic end-to-end (no sampling), so the DuckDB
# oracle recomputes cells AND estimates cell-for-cell.
# --------------------------------------------------------------------------


def _bin_sql(value_col: str, bins: int) -> str:
    """Equal-width bin id over [mn, mx] with the top edge clamped into the
    last bin — identical text in both engines modulo floor's return type."""
    width = f"((mx - mn) / {bins})"
    return (
        f"CASE WHEN mx = mn THEN CAST(0 AS BIGINT) "
        f"ELSE least(CAST({bins - 1} AS BIGINT), "
        f"CAST(floor(({value_col} - mn) / {width}) AS BIGINT)) END"
    )


def histogram_sketch(df: DataFrame, value_col: str, bins: int = 128):
    """(cells, stats): the bounded-state quantile sketch. `cells` =
    (bin, cnt), ≤ bins rows; `stats` = one row (mn, mx, n). The stats row
    broadcasts; binning is a narrow projection over the scan."""
    stats = df.agg(
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    cells = (
        df.crossJoin(F.broadcast(stats))
        .select(F.expr(_bin_sql(value_col, bins)).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cells, stats


def histogram_quantiles(
    cells: DataFrame, stats: DataFrame, qs: list[float], bins: int = 128
) -> DataFrame:
    """(q, est): quantile estimates from the sketch — cumulative counts
    over the ≤ bins cells, then linear interpolation inside the first bin
    whose cumulative count covers q·n. All arithmetic over the tiny cell
    relation; the same formula text runs in the DuckDB oracle."""
    from pyspark.sql.window import Window

    w = Window.orderBy("bin")
    cum = cells.withColumn("cum", F.sum("cnt").over(w))
    q_rows = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    covering = (
        cum.crossJoin(F.broadcast(stats))
        .select("bin", "cnt", "cum", "mn", "mx", "n", q_rows)
        .filter(F.col("cum") >= F.col("q") * F.col("n"))
        .withColumn(
            "r", F.row_number().over(Window.partitionBy("q").orderBy("bin"))
        )
        .filter(F.col("r") == 1)
    )
    est = (
        "CASE WHEN mx = mn THEN mn ELSE "
        f"mn + ((mx - mn) / {bins}) * (bin + (q * n - (cum - cnt)) / cnt) END"
    )
    # portable FLOOR(x·1e6 + 0.5)/1e6 half-up, not native ROUND: the
    # interpolated estimate over a cents-lattice input is a DYADIC
    # rational (/bins and /cnt are the only divisions) that lands exactly
    # ON 1e-6 rounding ties, where Spark's repr-HALF_UP and DuckDB's
    # double-half-away disagree (scan-found on a fresh random seed)
    return covering.select(
        "q", F.expr(f"FLOOR(({est}) * 1e6 + 0.5) / 1e6").alias("est")
    )
