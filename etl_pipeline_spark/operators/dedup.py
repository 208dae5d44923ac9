"""Reusable dedup operators over arbitrary (id, text) DataFrames.

The oracle-checked queries in ``plans/llm.py`` are instantiations of these
operators on the synthetic corpus; users point them at their own tables.
All operators are pure DataFrame composition — the only Python that runs
per-row is inside Spark's codegen'd expressions.

Scale notes per operator are on the functions; the common theme: candidate
generation is always an equi-join on a derived key (hash, band, bucket)
with BOUNDED per-key fan-out, never an all-pairs product. The exact
verifiers (`jaccard_pairs`, `containment_pairs`) enforce this with a
document-frequency cap on the shingle relation (`DF_CAP`), the same hot-
key kill as winnowing's stop-fingerprint cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Document-frequency cap for the exact shingle verifiers: a shingle held
# by more than DF_CAP documents is boilerplate (licence headers, nav
# chrome, templated text) and is dropped BEFORE the self-join, in both
# engines. This bounds per-key join fan-out at DF_CAP² pairs and total
# candidate cost at DF_CAP·|shingles| — linear in corpus size — where the
# uncapped Σ df(shingle)² is quadratic on any hot key (one boilerplate
# trigram shared by 10⁶ docs → 10¹² pairs). Same device as winnowing's
# stop-fingerprint cap (operators/fingerprint.py); the cap is part of the
# operator's contract and the DuckDB oracles apply the identical filter.
DF_CAP = 128


def df_capped_shingles(shingle_df: DataFrame, cap: int = DF_CAP) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``cap``. One
    shingle-keyed window count — the hash partitioning it installs is
    exactly the self-join's key, so AQE reuses the exchange."""
    w = Window.partitionBy("shingle")
    return (
        shingle_df.withColumn("_df", F.count(F.lit(1)).over(w))
        .where(F.col("_df") <= cap)
        .drop("_df")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle): distinct word n-gram shingles per document.

    Documents with fewer than ``n`` tokens emit no shingles — enforced
    by a ROW filter, not a greatest() clamp inside the sequence bound:
    Spark's ``sequence(1, 0)`` yields a DESCENDING [1, 0] whose index-0
    access throws INVALID_ARRAY_INDEX under ANSI mode on any sub-n doc
    (fuzz-found: tests/test_engine_fuzz.py::test_shingles_match_duckdb_cte;
    DuckDB's generate_series(1, 0) is empty, so the filter also matches
    the oracle CTE's semantics exactly)."""
    span = ", ".join(f"toks[i-1+{j}]" for j in range(n))
    expr = (
        f"transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> concat_ws(' ', {span}))"
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("toks"))
        .where(F.size("toks") >= n)
        .select("doc_id", F.explode(F.array_distinct(F.expr(expr))).alias("shingle"))
    )


# ordered index-pair combinations of a sorted posting list: for i < j,
# struct(docs[i] AS doc_a, docs[j] AS doc_b) — the multiset of rows the
# shingle-keyed equi-self-join with a.doc_id < b.doc_id would emit
# (sorted ⇒ doc_a <= doc_b; callers filter the strict < after explode)
_PAIR_EXPR = (
    "flatten(transform(docs, (x, i) ->"
    " transform(slice(docs, i + 2, size(docs) - i - 1),"
    " y -> struct(x AS doc_a, y AS doc_b))))"
)


def containment_pairs(
    shingle_df: DataFrame, threshold: float, df_cap: int = DF_CAP
) -> DataFrame:
    """Asymmetric near-dup: pairs where the SMALLER shingle set is mostly
    inside the larger — containment = |A∩B| / min(|A|, |B|). Catches
    subset/prefix duplication (a doc embedded in a longer one) that
    resemblance Jaccard dilutes below any LSH threshold (a half-doc has
    Jaccard ≈ 0.5 against its source but containment 1.0). LSH can't
    gate containment (its bands hash resemblance, which is exactly what
    containment pairs lack), so the scale device is the document-
    frequency cap: the self-join runs on the ``df_cap``-capped shingle
    relation (sizes too — containment is exact over the capped
    relation), bounding per-key fan-out at df_cap² and total cost at
    df_cap·|shingles|. Set ``df_cap=None`` only for bounded inputs —
    or for inputs already capped by the caller (e.g. a persisted,
    memoized shingle relation: this operator consumes its input FOUR
    times, both self-join sides and both size lookups, so callers with
    an expensive build should hand it a cached relation)."""
    # Same grouped pair generation as jaccard_pairs below (one
    # groupBy(shingle) replaces the df-cap window + sort-merge
    # self-join; see the comments there for the NULL conventions).
    grouped = shingle_df.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("docs"),
        F.count(F.lit(1)).alias("_df"),
    )
    if df_cap is not None:
        grouped = grouped.where(F.col("_df") <= df_cap)
    sizes = (
        grouped.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    inter = (
        grouped.where(F.col("shingle").isNotNull())
        .select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    cont = F.col("n_common") / F.least(F.col("sa.n"), F.col("sb.n"))
    return (
        inter.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .filter(cont >= threshold)
        .select(
            "doc_a", "doc_b", "n_common", F.round(cont, 6).alias("containment")
        )
    )


def jaccard_pairs(
    shingle_df: DataFrame, threshold: float, df_cap: int = DF_CAP
) -> DataFrame:
    """Exact Jaccard over the ``df_cap``-capped shingle relation: all
    pairs sharing ≥1 surviving shingle. The cap bounds the self-join's
    per-key fan-out (df_cap² pairs per shingle, df_cap·|shingles| total)
    — without it one boilerplate shingle makes the candidate stage
    quadratic. Jaccard is exact over the capped relation (sizes are
    capped too). For threshold-recall guarantees at scale prefer the
    LSH pipeline (:func:`minhash_lsh_pairs`); this is the exact
    verifier. Set ``df_cap=None`` only for bounded inputs."""
    # Grouped pair generation instead of window-cap + sort-merge
    # self-join: ONE groupBy(shingle) yields both the df cap (array
    # size) and, per surviving shingle, every ordered candidate pair as
    # an in-memory combination of the sorted posting list — the same
    # multiset of (doc_a < doc_b) rows the equi-self-join emits, without
    # the window sort or the two join-side sorts over the shingle
    # relation (guide §2.3/§2.4). Per-key work is bounded by the cap
    # (≤ cap²/2 pairs per shingle). NULL-shingle rows count toward df
    # and doc sizes (the window counted them too) but pair no one —
    # join-on-equality semantics. The cap compares the ROW count (the
    # window's COUNT(*)), not size(docs): collect_list drops NULL
    # doc_ids, which the window counted.
    grouped = shingle_df.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("docs"),
        F.count(F.lit(1)).alias("_df"),
    )
    if df_cap is not None:
        grouped = grouped.where(F.col("_df") <= df_cap)
    sizes = (
        grouped.select(F.explode("docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    inter = (
        grouped.where(F.col("shingle").isNotNull())
        .select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        # sorted posting list ⇒ doc_a <= doc_b; keep strictly-less pairs
        # only, mirroring the join's a.doc_id < b.doc_id
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("sa.n") + F.col("sb.n") - F.col("n_common"))
    return (
        inter.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def jaccard_verify(candidates: DataFrame, shingle_df: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of (doc_a, doc_b) candidate pairs."""
    sizes = shingle_df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa, sb = shingle_df.alias("sa"), shingle_df.alias("sb")
    verified = (
        candidates.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b")) & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("na.n") + F.col("nb.n") - F.col("n_common"))
    return (
        verified.join(sizes.alias("na"), F.col("na.doc_id") == F.col("doc_a"))
        .join(sizes.alias("nb"), F.col("nb.doc_id") == F.col("doc_b"))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


_MINHASH_CHUNKS_PER_MD5 = 4  # 32 hex chars → 4 disjoint 8-char (32-bit) hashes


def minhash_signatures(shingle_df: DataFrame, n_hashes: int = 8) -> DataFrame:
    """k min-hashes per doc: string-min over disjoint 8-hex-char chunks of
    seeded md5 digests — a valid min-wise family (each chunk is an
    independent 32-bit hash of the shingle) that evaluates identically in
    SQL oracles, at ceil(k/4) md5 calls per shingle instead of k. The
    digests are projected once below the aggregate."""
    n_seeds = (n_hashes + _MINHASH_CHUNKS_PER_MD5 - 1) // _MINHASH_CHUNKS_PER_MD5
    seeded = shingle_df.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{g}:"), F.col("shingle"))).alias(f"m{g}")
            for g in range(n_seeds)
        ],
    )
    return seeded.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(
                    F.col(f"m{i // _MINHASH_CHUNKS_PER_MD5}"),
                    (i % _MINHASH_CHUNKS_PER_MD5) * 8 + 1,
                    8,
                )
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )


def lsh_candidates(sigs: DataFrame, n_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """Banded LSH: docs sharing any (band_id, band_key) become candidate
    pairs. The equi-join on the band key IS the scale story: shuffle is
    keyed on buckets, cost follows collisions, not |docs|²."""
    n_bands = n_hashes // band_size
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat(*[F.col(f"h{band_size * b + r}") for r in range(band_size)])
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_structs).alias("band")).select(
        "doc_id", F.col("band.band_id").alias("band_id"), F.col("band.band_key").alias("band_key")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """End-to-end near-dup pipeline: shingle → minhash → LSH candidates →
    exact-Jaccard verify. Returns (doc_a, doc_b, jaccard ≥ threshold)."""
    sh = shingles(df, id_col, text_col, shingle_n)
    cands = lsh_candidates(minhash_signatures(sh, n_hashes), n_hashes, band_size)
    return jaccard_verify(cands, sh, threshold)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: (text_hash, canonical_id = min id, n_copies)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(F.col(id_col)).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
