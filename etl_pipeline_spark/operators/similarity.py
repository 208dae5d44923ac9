"""Similarity-search operators over embedding DataFrames.

Cosine math is built-in higher-order functions (`zip_with`/`aggregate`) in
double precision — JVM-side, left-to-right fold, bit-reproducible (and
matched by the DuckDB oracles in plans/llm.py).

Three search paths:
- `cosine_topk`: brute force — broadcast the (small) query set against the
  partitioned corpus; exact, O(|q|·|corpus|).
- `sign_lsh_topk`: search only within sign-quantization buckets — the
  approximate scale path; the bucket id is the shuffle/partition key.
- `ivf_topk`: inverted-file index — spherical k-means coarse quantizer
  trained on a bounded sample, centroids broadcast, corpus partitioned by
  nearest-centroid cell, search probes only the query's `nprobe` nearest
  cells. The FAISS IVF-Flat architecture re-expressed in DataFrame ops.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_spark.utils.local_rows import sql_literal, values_df
from etl_pipeline_spark.utils.parallelism import fan_out_scan
from etl_pipeline_spark.utils.session_cache import register_cache, session_key
from etl_pipeline_spark.utils.udfpickle import pickle_module_by_value

pickle_module_by_value(__name__)

_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM = (
    "sqrt(aggregate(transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def cosine_expr(a: str, b: str) -> Column:
    """cos(a, b) as a Column over two array<float|double> columns.

    Zero-norm vectors yield NULL (undefined cosine), not NaN: a bare
    0/0 division returns NaN, and NaN sorts ABOVE every real value in a
    descending window — a single all-zeros embedding would silently
    outrank every true neighbor in the top-k operators. NULL sorts last
    under Spark's default DESC ordering, so zero vectors can never beat
    a real match (fuzz-pinned in tests/test_engine_fuzz.py). On corpora
    without zero vectors the expression is unchanged (oracle parity
    unaffected)."""
    return F.expr(_DOT.format(a=a, b=b)) / F.nullif(
        F.expr(_NORM.format(v=a)) * F.expr(_NORM.format(v=b)), F.lit(0.0)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, cosine).

    Zero-norm semantics ("last, not never"): ``cosine_expr`` yields NULL
    for a zero-norm pair, and NULL sorts LAST under the DESC ranking
    window — so a zero vector can never outrank a real neighbor, but when
    a query has fewer than k real candidates the remaining rank slots ARE
    filled by NULL-cosine rows rather than omitted. The DuckDB oracles
    share this convention (NULLS LAST is both engines' DESC default), so
    parity holds either way; callers that want "never" filter
    ``cosine IS NOT NULL`` on the result. Same convention in
    ``sign_lsh_topk`` / ``ivf_topk`` below."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    )
    # per-pair dot products are the scan stage's compute on the corpus
    # side — fan a 1-split input out first (guide §2.5)
    c = fan_out_scan(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"))
    )
    scored = q.join(c, F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine_expr("qe", "ce").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "cosine")
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


def sign_bucket(vec_col: str, dims: tuple[int, ...]) -> Column:
    """Sign-quantization bucket id from fixed 1-indexed dimensions."""
    col = F.col(vec_col)
    acc: Column = F.lit(0)
    for i, d in enumerate(dims):
        acc = acc + F.when(F.element_at(col, d) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return acc


def sign_lsh_topk(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (1, 17, 33, 49),
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket."""
    b = corpus.select(
        F.col(id_col), F.col(vec_col), sign_bucket(vec_col, dims).alias("bucket")
    )
    q = b.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"), F.col("bucket")
    )
    c = b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ce"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = q.join(
        c, (F.col("bucket") == F.col("c_bucket")) & (F.col("neighbor_id") != F.col("query_id"))
    ).select("query_id", "neighbor_id", "bucket", cosine_expr("qe", "ce").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id", "neighbor_id", "bucket", F.row_number().over(w).alias("rank"), "cosine"
        )
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "bucket", "rank", F.round("cosine", 6).alias("cosine"))
    )


def cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    block_rows: int = 1024,
) -> DataFrame:
    """Exact embedding-space near-dup pairs: (vec_a, vec_b, cosine ≥
    threshold), vec_a < vec_b. Zero-norm vectors form NO pairs (undefined
    cosine — the cosine_expr NULL convention; fuzz-pinned against a
    brute force in tests/test_engine_fuzz.py).

    BLAS-blocked brute force: vectors hash (id % nb) into ~`block_rows`-
    sized blocks; each of the nb·(nb+1)/2 unordered block pairs becomes
    ONE Arrow task that normalizes its two blocks and runs a single
    numpy GEMM, emitting only threshold survivors. A previous revision
    scored each pair with the per-element higher-order-function cosine
    — measured 74 s for 2k vectors at sf0.1 (≈37 µs/pair, all lambda
    interpretation); the GEMM form does the identical 2M-pair math in
    one BLAS call per block pair (SCALING.md "Exact cosine pairs: the
    lambda-vs-GEMM gap"). The work is inherently O(n²) FLOPs — at scale
    you gate candidates with sign-LSH buckets first
    (`ann_bucketed_sign_lsh`) and keep this kernel as the in-bucket
    exact verifier; the block-replication shuffle (each row lands in nb
    tasks per side) is the unavoidable exact-all-pairs data movement.
    """
    import pandas as pd

    spark = corpus.sparkSession
    n = corpus.count()
    nb = max(1, -(-n // block_rows))
    v = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        (F.col(id_col) % nb).cast("int").alias("blk"),
    )
    # unordered block pairs derived from spark.range, not a parallelized
    # Python list: createDataFrame pickles the pairs into
    # defaultParallelism near-empty PythonRDD partitions, so every
    # consuming stage pays one Python-worker round-trip per core; range
    # is a JVM LocalTableScan-like source and also stays cheap when nb
    # is large at scale (nb² enumeration, i <= j kept)
    bp = (
        # few-partition range: the pair table is tiny per row; one task
        # per ~4M enumerated ids keeps the build single-task locally and
        # still parallel if nb² ever gets huge
        spark.range(0, nb * nb, 1, max(1, (nb * nb) // 4_000_000))
        .select(
            # integer DIV, not double division + floor-cast: double floor
            # misrounds once nb*nb approaches 2^53 — exactly the huge-nb
            # regime this range form exists for (ADVICE r11)
            F.expr(f"CAST(id DIV {nb} AS INT)").alias("ba"),
            (F.col("id") % nb).cast("int").alias("bb"),
        )
        .where(F.col("ba") <= F.col("bb"))
    )
    a_side = v.join(F.broadcast(bp), F.col("blk") == F.col("ba")).select(
        "ba", "bb", "vid", "v", F.lit(0).alias("side")
    )
    b_side = (
        v.join(
            F.broadcast(bp.where(F.col("ba") != F.col("bb"))),
            F.col("blk") == F.col("bb"),
        ).select("ba", "bb", "vid", "v", F.lit(1).alias("side"))
    )
    both = a_side.unionByName(b_side)

    empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
        {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
    )

    def gemm(key, pdf):
        ba, bb = int(key[0]), int(key[1])

        def _ids_mat(side: pd.DataFrame):
            # zero-norm vectors have UNDEFINED cosine — drop them before
            # scoring, matching cosine_expr's NULL convention ("never a
            # pair", not "a pair with cosine 0": _normalize_rows maps a
            # zero row to the zero vector, whose GEMM score 0.0 would
            # pass any threshold <= 0 — fuzz-found, test_engine_fuzz)
            mat = np.vstack(side["v"].to_numpy()).astype(np.float64)
            keep = np.linalg.norm(mat, axis=1) > 0.0
            return side["vid"].to_numpy()[keep], _normalize_rows(mat[keep])

        left = pdf[pdf["side"] == 0].sort_values("vid")
        # Sparse / non-contiguous ids (the in-bucket verifier case) can
        # leave a residue class with rows on only one side of the pair —
        # np.vstack on the empty side would raise, so bail out early.
        if left.empty:
            return empty
        ids_a, ma = _ids_mat(left)
        if len(ids_a) == 0:
            return empty
        if ba == bb:
            ids_b, mb = ids_a, ma
        else:
            right = pdf[pdf["side"] == 1].sort_values("vid")
            if right.empty:
                return empty
            ids_b, mb = _ids_mat(right)
            if len(ids_b) == 0:
                return empty
        c = ma @ mb.T
        ia, ib = np.nonzero(c >= threshold)
        va, vb = ids_a[ia], ids_b[ib]
        if ba == bb:  # drop the diagonal + the mirror of each pair
            keep = va < vb
            va, vb, cv = va[keep], vb[keep], c[ia, ib][keep]
        else:  # distinct blocks: every pair is unique; orient by id
            cv = c[ia, ib]
        # HALF_UP (away from zero) to match Spark's F.round / DuckDB's
        # ROUND; np.round is banker's rounding and diverges on exact
        # 6-dp midpoints.
        cv6 = np.sign(cv) * np.floor(np.abs(cv) * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "vec_a": np.minimum(va, vb),
                "vec_b": np.maximum(va, vb),
                "cosine": cv6,
            }
        )

    return (
        both.groupBy("ba", "bb")
        .applyInPandas(gemm, "vec_a long, vec_b long, cosine double")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) index — the 100 TB similarity-search architecture.
#
# Training: the coarse quantizer is spherical k-means on a BOUNDED sample
# (the standard IVF recipe — FAISS trains on a sample too), so training
# cost is O(sample · ncells · iters) regardless of corpus size, and the
# centroid matrix (ncells × dim doubles) broadcasts to every executor.
# Assignment + probing are Arrow-batched NumPy matmuls (one BLAS call per
# batch, never per-row Python). The cell id becomes the corpus partition
# key: at scale, write the corpus bucketed/partitioned by cell once, then
# every query touches only nprobe/ncells of the data.
# --------------------------------------------------------------------------


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 8,
    sample_limit: int = 4096,
    iters: int = 5,
) -> list[list[float]]:
    """Deterministic spherical k-means centroids from a bounded sample.

    The sample is the first `sample_limit` rows by id (deterministic across
    runs/partitionings); init is evenly-spaced sample rows (no RNG, so the
    index is reproducible — the engine's determinism rule). Lloyd updates
    run in NumPy on the driver: the sample is bounded, never the corpus.
    """
    sample = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample_limit)
        .toPandas()
    )
    x = _normalize_rows(np.vstack(sample["v"].to_numpy()).astype(np.float64))
    n = len(x)
    ncells = min(ncells, n)
    cents = x[np.linspace(0, n - 1, ncells).astype(int)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(ncells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize_rows(cents)
    return cents.tolist()


def _cell_udfs(centroids: list[list[float]], nprobe: int):
    """Build (assign_cell, probe_cells) pandas UDFs closing over the
    centroid matrix — shipped by value inside the closure (no executor-side
    state, no fit/predict server round-trips)."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign_cell(vecs: pd.Series) -> pd.Series:
        x = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(x @ cents.T, axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        x = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        sims = x @ cents.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    return assign_cell, probe_cells


def assign_ivf_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Corpus + nearest-centroid cell id (the partition key at scale)."""
    assign_cell, _ = _cell_udfs(centroids, nprobe=1)
    return corpus.withColumn(out_col, assign_cell(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 8,
    nprobe: int = 2,
    k: int = 3,
    sample_limit: int = 4096,
) -> DataFrame:
    """Approximate top-k: probe the query's `nprobe` nearest cells only.

    Plan shape: queries explode to (query, probe_cell) — nprobe rows each —
    then equi-join the cell-assigned corpus on cell id (the shuffle key;
    with a cell-partitioned corpus this is a pruned scan, not a shuffle),
    exact cosine inside candidates, window top-k per query.
    `nprobe == ncells` degrades gracefully to exact brute force.
    """
    centroids = train_ivf_centroids(
        corpus, id_col=id_col, vec_col=vec_col, ncells=ncells, sample_limit=sample_limit
    )
    assign_cell, probe_cells = _cell_udfs(centroids, nprobe=nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ce"),
        assign_cell(F.col(vec_col)).alias("cell"),
    )
    q = (
        corpus.filter(query_filter)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qe"),
            probe_cells(F.col(vec_col)).alias("probes"),
        )
        .select("query_id", "qe", F.explode("probes").alias("cell"))
    )
    scored = F.broadcast(q).join(
        c, (q.cell == c.cell) & (F.col("neighbor_id") != F.col("query_id"))
    ).select("query_id", "neighbor_id", cosine_expr("qe", "ce").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "cosine")
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — the memory-side scale path for ANN. IVF above
# prunes WHICH vectors a query scans; PQ shrinks WHAT is scanned: each
# vector compresses to m sub-space codebook codes (m bytes at ksub<=256 vs
# dim*4 bytes raw — 32x for 64-dim float32), and query-time scoring is
# table lookups, never full-vector arithmetic. IVF-PQ composed = FAISS's
# 100 TB layout. Jégou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011.
#
# Determinism rule (same as IVF): bounded sample ordered by id, linspace
# init, fixed Lloyd iterations — no RNG anywhere, so codes and search
# results are reproducible run-to-run.
# --------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_limit: int = 4096,
    iters: int = 8,
) -> list:
    """Per-subspace L2 k-means codebooks [m][ksub][dim/m] from a bounded,
    deterministic sample of the (normalized) corpus."""
    sample = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample_limit)
        .toPandas()
    )
    x = _normalize_rows(np.vstack(sample["v"].to_numpy()).astype(np.float64))
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = min(ksub, n)
    books = []
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = sub[np.linspace(0, n - 1, ksub).astype(int)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.tolist())
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the m-byte PQ code (array<int>) per vector — an Arrow-batched
    argmin per subspace; by-value closure, no executor state."""
    books = np.asarray(codebooks, dtype=np.float64)  # [m][ksub][dsub]
    m, _, dsub = books.shape

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        x = _normalize_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            sub = x[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return corpus.withColumn(out_col, encode(F.col(vec_col)))


def pq_topk(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    k: int = 3,
    sample_limit: int = 4096,
) -> DataFrame:
    """Approximate cosine top-k via asymmetric distance computation.

    Queries stay exact (driver-side distance tables, queries are a bounded
    set by contract); the corpus is scanned as codes only. Per mapInPandas
    batch the score is m table lookups per (query, vector) — no vector
    arithmetic touches corpus floats at query time. On normalized vectors
    L2² = 2 - 2·cos, so approx_cosine = 1 - d²/2 and ranking by d² asc is
    ranking by cosine desc.
    """
    books = train_pq_codebooks(
        corpus, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, sample_limit=sample_limit
    )
    books_np = np.asarray(books, dtype=np.float64)
    dsub = books_np.shape[2]

    queries = (
        corpus.filter(query_filter)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
        .orderBy("query_id")
        .toPandas()
    )
    qx = _normalize_rows(np.vstack(queries["qe"].to_numpy()).astype(np.float64))
    qids = queries["query_id"].to_numpy()
    # distance tables [nq][m][ksub]
    tables = np.stack(
        [
            np.stack(
                [
                    ((qx[:, j * dsub : (j + 1) * dsub][:, None, :] - books_np[j][None, :, :]) ** 2).sum(axis=2)
                    for j in range(books_np.shape[0])
                ],
                axis=1,
            )
        ]
    )[0]  # [nq][m][ksub]

    encoded = pq_encode(corpus, books, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "pq_code"
    )

    def _score(batches):
        for pdf in batches:
            if pdf.empty:  # empty Arrow batch: vstack would raise
                continue
            codes = np.vstack(pdf["pq_code"].to_numpy())  # [n][m]
            n = len(codes)
            out_q, out_n, out_c = [], [], []
            for qi in range(len(qids)):
                # d2[i] = sum_j tables[qi][j][codes[i][j]]
                d2 = tables[qi][np.arange(codes.shape[1])[None, :], codes].sum(axis=1)
                out_q.append(np.full(n, qids[qi], dtype=np.int64))
                out_n.append(pdf["neighbor_id"].to_numpy())
                out_c.append(1.0 - d2 / 2.0)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "approx_cosine": np.concatenate(out_c),
                }
            )

    scored = encoded.mapInPandas(
        _score, "query_id bigint, neighbor_id bigint, approx_cosine double"
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "approx_cosine"
        )
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("approx_cosine", 6).alias("approx_cosine"))
    )


def ivfpq_topk(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    k: int = 3,
    sample_limit: int = 4096,
) -> DataFrame:
    """IVF-PQ composed: cell probing prunes WHICH codes are scanned, PQ
    codes shrink WHAT is scanned — the FAISS IVFADC layout as a DataFrame
    plan. At scale the encoded corpus is written once, partitioned by
    cell (bytes per row: 4 id + m codes), and a query reads nprobe/ncells
    of that already-32x-smaller table; scoring is ADC table lookups.
    ``nprobe == ncells`` degrades to exactly ``pq_topk``.
    """
    ivf_cents = train_ivf_centroids(
        corpus, id_col=id_col, vec_col=vec_col, ncells=ncells, sample_limit=sample_limit
    )
    books = train_pq_codebooks(
        corpus, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, sample_limit=sample_limit
    )
    books_np = np.asarray(books, dtype=np.float64)
    dsub = books_np.shape[2]
    assign_cell, probe_cells = _cell_udfs(ivf_cents, nprobe=nprobe)

    encoded = (
        pq_encode(corpus, books, vec_col=vec_col)
        .withColumn("cell", assign_cell(F.col(vec_col)))
        .select(F.col(id_col).alias("neighbor_id"), "cell", "pq_code")
    )

    queries = (
        corpus.filter(query_filter)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
        .orderBy("query_id")
        .toPandas()
    )
    qx = _normalize_rows(np.vstack(queries["qe"].to_numpy()).astype(np.float64))
    qids = queries["query_id"].to_numpy()
    tables = np.stack(
        [
            np.stack(
                [
                    ((qx[:, j * dsub : (j + 1) * dsub][:, None, :] - books_np[j][None, :, :]) ** 2).sum(axis=2)
                    for j in range(books_np.shape[0])
                ],
                axis=1,
            )
        ]
    )[0]  # [nq][m][ksub]
    id2idx = {int(q): i for i, q in enumerate(qids)}
    n_sub = books_np.shape[0]

    @F.pandas_udf("double")
    def adc(qid: pd.Series, code: pd.Series) -> pd.Series:
        qidx = qid.map(id2idx).to_numpy(dtype=np.int64)
        codes = np.vstack(code.to_numpy())
        d2 = tables[qidx[:, None], np.arange(n_sub)[None, :], codes].sum(axis=1)
        return pd.Series(1.0 - d2 / 2.0)

    qprobe = (
        corpus.filter(query_filter)
        .select(
            F.col(id_col).alias("query_id"),
            probe_cells(F.col(vec_col)).alias("probes"),
        )
        .select("query_id", F.explode("probes").alias("cell"))
    )
    cand = F.broadcast(qprobe).join(encoded, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", adc(F.col("query_id"), F.col("pq_code")).alias("approx_cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_cosine"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "approx_cosine")
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("approx_cosine", 6).alias("approx_cosine"))
    )


# --------------------------------------------------------------------------
# Relational ANN variants — same index architectures (IVF cell pruning,
# PQ code compression, IVF-PQ composed) with an oracle-recomputable
# quantizer: pivots/codebook centers are linspace-positioned rows of the
# bounded ordered sample, i.e. exactly the k-means INIT the trained
# variants use (0 Lloyd iterations). The corpus-side plan is pure
# DataFrame algebra (zero Python, zero Exchange in the encode — guarded
# by test_scale_plans.py), and every value the index build produces is
# reproduced term-for-term by the DuckDB oracle SQL (plans/llm.py), so
# the driver value-checks neighbors cell-for-cell. The bounded artifacts
# themselves — ncells pivots, m·ksub codebook rows, the nq·m·ksub query
# distance table — are built on the DRIVER from the collected sample
# (the same bounded-sample discipline as the trained FAISS-style variants
# above) and shipped as broadcast local relations: index build is a
# one-time cost on ≤sample_limit rows, never a corpus-sized job. The
# k-means-trained variants above stay the quality path, pinned by recall
# tests (test_similarity_ivf.py / _pq.py).
#
# Determinism discipline shared with the oracles:
# - pivot row = (i · max_rn) div (n_pivots - 1): integer arithmetic only;
# - every float the driver computes (norms, |center|², distance-table d²)
#   uses the same left-associated IEEE-double op sequence as the engine
#   folds, so the values are bit-identical to a relational recomputation;
# - ranking keys are ROUNDED (cosine and encode scores → 6 dp) BEFORE
#   row_number, ties broken by id — so last-ulp float differences between
#   engines (or between partial-agg orders) can never flip a rank.
# --------------------------------------------------------------------------


def _round6(x: float) -> float:
    """round(x, 6) with Spark/DuckDB semantics: HALF_UP on the shortest
    decimal representation (Java BigDecimal.valueOf path) — Python's builtin
    round() is HALF_EVEN and must not be used for engine-shared keys.

    Quantizing needs (integer digits + 6) digits of context precision; the
    default 28-digit context raises InvalidOperation for |x| >= ~1e22. A
    widened local context (350 > the 309+6 digits of the largest finite
    double) makes the helper total over all finite doubles, like F.round."""
    import decimal

    with decimal.localcontext(decimal.Context(prec=350)):
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        )


def _py_dot(a: list[float], b: list[float]) -> float:
    """Left-associated dot product — the exact IEEE op sequence of the SQL
    fold `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`
    (and of DuckDB's list_dot_product), so driver-built artifacts are
    bit-identical to a relational recomputation."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _py_normalize(v: list[float]) -> list[float]:
    """Unit-normalize with the engine's op order: x / sqrt(Σ x·x).
    Zero vectors pass through unscaled (norm treated as 1, the same
    guard as _normalize_rows) instead of raising ZeroDivisionError."""
    nrm = math.sqrt(_py_dot(v, v)) or 1.0
    return [x / nrm for x in v]


def _ordered_sample(
    corpus: DataFrame, id_col: str, vec_col: str, sample_limit: int
) -> list[list[float]]:
    """First `sample_limit` NON-ZERO-NORM vectors by id, as driver-side
    doubles. TakeOrdered keeps this a bounded top-k scan — never a global
    sort of the corpus — and float32→double conversion is exact, so the
    collected values equal the engine's CAST(... AS DOUBLE).

    Zero-norm vectors are excluded from index TRAINING (you cannot train
    a cosine quantizer on a direction-free vector: a zero-norm pivot or
    codebook center makes every score 0/0 — the driver probe raised
    ZeroDivisionError, found by the randomized-fixture sweep). They stay
    in the CORPUS: both engines assign them cell 0 (all-NaN/NULL scores
    tie-break by cell asc) and their candidate cosines are NULL, sorting
    last — the engine-wide zero-norm convention. The DuckDB oracles'
    sample CTEs carry the same norm filter.

    Empty / all-zero-norm corpora return [] — the query-level contract is
    an EMPTY top-k result (the oracle's sample CTE is empty too), not an
    exception (empty-input probe, r11); ``build_ivfpq_index`` still
    refuses to MATERIALIZE an index of nothing."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .filter(F.expr(_NORM.format(v=vec_col)) > 0.0)
        .orderBy("i")
        .limit(sample_limit)
        .collect()
    )
    return [[float(x) for x in r.v] for r in rows]


def _empty_topk(corpus: DataFrame, id_col: str, score_name: str) -> DataFrame:
    """Empty (query_id, neighbor_id, rank, <score>) result with the
    corpus's id type — what every top-k returns for an empty /
    all-zero-norm corpus (the oracle's empty sample CTE yields the same
    zero rows)."""
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    idt = corpus.schema[id_col].dataType
    return corpus.sparkSession.createDataFrame(
        [],
        StructType(
            [
                StructField("query_id", idt),
                StructField("neighbor_id", idt),
                StructField("rank", IntegerType(), False),
                StructField(score_name, DoubleType()),
            ]
        ),
    )


def _norm_unrolled_sql(v: str, dim: int) -> str:
    terms = " + ".join(
        f"(CAST({v}[{i}] AS DOUBLE) * CAST({v}[{i}] AS DOUBLE))" for i in range(dim)
    )
    return f"sqrt(CAST(0.0 AS DOUBLE) + {terms})"


def _pivot_rows(
    sample: list[list[float]], ncells: int
) -> list[tuple[int, list[float], float]]:
    """(cell, pe, pn) linspace pivots with norms precomputed — the
    engine's op order (sqrt of the left-assoc square sum)."""
    if ncells < 2:
        raise ValueError(f"ncells must be >= 2, got {ncells}")
    mx = len(sample) - 1
    return [
        (cell, pe, math.sqrt(_py_dot(pe, pe)))
        for cell in range(ncells)
        for pe in [sample[(cell * mx) // (ncells - 1)]]
    ]


def _pivot_array(spark, pivots: list[tuple[int, list[float], float]]) -> DataFrame:
    """ONE broadcast row holding array<struct<cell, pe, pn>> sorted by
    cell. Cross-joining this single row onto the corpus makes cell
    scoring a narrow projection — no corpus-side Exchange (and no
    repeated sample jobs) in the encode."""
    # pure-SQL literal → LocalRelation: a createDataFrame here pickles the
    # one row into defaultParallelism PythonRDD slices, and every
    # execution's broadcast build then runs a cores-wide stage of idle
    # Python-worker round-trips (~0.5-1 s each at local[32])
    structs = ", ".join(
        f"named_struct('cell', CAST({int(cell)} AS INT), "
        f"'pe', {sql_literal(pe, 'array<double>')}, "
        f"'pn', {sql_literal(pn, 'double')})"
        for cell, pe, pn in pivots
    )
    return F.broadcast(spark.sql(f"SELECT array({structs}) AS pivs"))


# Per-pivot score inside a higher-order lambda: the same left-assoc
# per-element-DOUBLE-cast sum as cosine_expr's fold (so values — and the
# DuckDB oracles — are unchanged), with the pivot norm read from the
# precomputed struct field. Rounded to 6 dp before the argmin so engines
# agree on ties (broken by cell asc). Negating the rounded score turns
# array_min/array_sort's (asc, asc) struct order into (cosine desc, cell
# asc) — exactly the old row_number ordering. With the dimension known the
# dot unrolls to static indexing — lambda bodies are never Janino-compiled,
# so the unroll is a pure interpreter win (no zip_with pair allocation, no
# per-element lambda frames) at zero compile cost.
def _pivot_score(vec: str, nrm: str, dim: int | None) -> str:
    if dim is None:
        dot = (
            f"aggregate(zip_with({vec}, p.pe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    else:
        terms = " + ".join(
            f"(CAST({vec}[{i}] AS DOUBLE) * CAST(p.pe[{i}] AS DOUBLE))" for i in range(dim)
        )
        dot = f"(CAST(0.0 AS DOUBLE) + {terms})"
    # nullif: a zero-norm corpus vector (nrm 0) would throw DIVIDE_BY_ZERO
    # under ANSI; NULL scores make array_min fall to cell asc → cell 0,
    # matching the DuckDB oracle (0/0 → NULL, DESC NULLS LAST, cell asc)
    return f"struct(-round({dot} / nullif(({nrm} * p.pn), 0.0), 6) AS s, p.cell AS c)"


def _nearest_cell_expr(vec: str, nrm: str, dim: int | None) -> Column:
    """argmax-cosine cell id as a narrow projection over the pivot array."""
    score = _pivot_score(vec, nrm, dim)
    return F.expr(f"array_min(transform(pivs, p -> {score})).c")


def _assign_cells_narrow(
    corpus: DataFrame, piv1: DataFrame, id_col: str, vec_col: str,
    id_alias: str, keep_vec: bool, dim: int | None = None,
) -> DataFrame:
    """(id_alias[, ce], cell): nearest-pivot cell per corpus vector, computed
    in one projection over the broadcast 1-row pivot array (zero Exchange
    between the corpus scan and the cell output — the encode is map-side)."""
    out = [F.col(id_alias), F.col("_cell").alias("cell")]
    if keep_vec:
        out.insert(1, F.col("ce"))
    return (
        corpus.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias("ce"))
        .crossJoin(piv1)
        .withColumn("_nrm", F.expr(_NORM.format(v="ce")))
        .withColumn("_cell", _nearest_cell_expr("ce", "_nrm", dim))
        .select(*out)
    )


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """(id_type, [(id, vec_doubles)]): one collect of the bounded query set,
    shared by the probe table and the ADC distance tables."""
    id_type = queries.schema[id_col].dataType
    rows = queries.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v")).collect()
    return id_type, [(r.i, [float(x) for x in r.v]) for r in rows]


def _probe_local(
    spark, qrows, id_type, pivots: list[tuple[int, list[float], float]],
    nprobe: int, keep_vec: bool,
) -> DataFrame:
    """(query_id[, qe], cell) as a broadcast local relation — the query-side
    probe list computed on the driver with the engine's op order (round(cos,
    6) desc, cell asc), so probed cells are identical to the relational
    formulation (and the DuckDB oracle). Skips a corpus-filter mini-job per
    query execution; queries are bounded by contract."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    rows = []
    for qid, qe in qrows:
        # zero-norm query: every pivot cosine is 0/0; treat the norm as 1
        # (cos = 0 for all cells -> probes the nprobe lowest cell ids
        # deterministically) rather than raising ZeroDivisionError
        qn = math.sqrt(_py_dot(qe, qe)) or 1.0
        ranked = sorted(
            (-_round6(_py_dot(qe, pe) / (qn * pn)), cell) for cell, pe, pn in pivots
        )
        for _, cell in ranked[:nprobe]:
            rows.append((qid, qe, cell) if keep_vec else (qid, cell))
    # LocalRelation when the id type has a literal encoding (always, for
    # the registered queries) — see _pivot_array for why createDataFrame
    # is the slow path here; kept as the fallback for exotic id types
    id_sql = id_type.simpleString()
    if rows and id_sql in ("bigint", "int", "string", "double"):
        schema = (
            f"query_id {id_sql}, qe array<double>, cell int"
            if keep_vec
            else f"query_id {id_sql}, cell int"
        )
        return F.broadcast(values_df(spark, rows, schema))
    fields = [StructField("query_id", id_type)]
    if keep_vec:
        fields.append(StructField("qe", ArrayType(DoubleType())))
    fields.append(StructField("cell", IntegerType()))
    return F.broadcast(spark.createDataFrame(rows, StructType(fields)))


# Session-memoized ANN index artifacts. An ANN index is built ONCE and
# queried many times — re-encoding the corpus per query would be like
# rebuilding a B-tree per lookup. With `index_cache_key` set (the
# registered queries pass the sf_dir), the corpus-side encode relation is
# persisted and the driver-side quantizer artifacts are reused across
# invocations in the same session; `build_ivfpq_index` is the durable
# parquet equivalent for real deployments.
_INDEX_MEMO: dict[tuple, tuple] = register_cache({})


def _index_artifacts(key: tuple | None, builder):
    """Memoize `builder()` under `key`; persist any DataFrame members."""
    if key is None:
        return builder()
    cached = _INDEX_MEMO.get(key)
    if cached is None:
        cached = tuple(
            v.persist() if isinstance(v, DataFrame) else v for v in builder()
        )
        _INDEX_MEMO[key] = cached
    return cached


def ivf_topk_relational(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 8,
    nprobe: int = 2,
    k: int = 3,
    sample_limit: int = 4096,
    index_cache_key: str | None = None,
) -> DataFrame:
    """IVF top-k with the pivot quantizer: assign each corpus vector to its
    nearest pivot's cell, probe each query's `nprobe` nearest cells, exact
    cosine inside candidates. At 100 TB the corpus is written partitioned
    by `cell`, so the candidate join is a pruned scan of nprobe/ncells of
    the data.

    Encode plan shape: the ncells pivots collapse to a single broadcast
    row (array of structs) and the per-vector argmax is a higher-order
    `array_min(transform(...))` projection — no crossJoin row explosion,
    no window, zero Exchange between the corpus scan and the cell output
    (guarded by test_scale_plans.py). Candidate cosines stay in the fold
    form: a 64-term static unroll pays ~7 s of one-time Janino compilation
    — the wrong trade for a query that runs once per session."""
    spark = corpus.sparkSession

    def build():
        sample = _ordered_sample(corpus, id_col, vec_col, sample_limit)
        if not sample:  # empty corpus → empty top-k (probe, r11)
            return None, None
        dim = len(sample[0])
        pivots = _pivot_rows(sample, ncells)
        piv1 = _pivot_array(spark, pivots)
        cells = _assign_cells_narrow(
            corpus, piv1, id_col, vec_col, "neighbor_id", keep_vec=True, dim=dim
        )
        return pivots, cells

    memo_key = (
        None
        if index_cache_key is None
        else (session_key(spark), index_cache_key, "ivf", id_col, vec_col, ncells, sample_limit)
    )
    pivots, cells = _index_artifacts(memo_key, build)
    if pivots is None:
        return _empty_topk(corpus, id_col, "cosine")
    id_type, qrows = _collect_queries(corpus.filter(query_filter), id_col, vec_col)
    probes = _probe_local(spark, qrows, id_type, pivots, nprobe, keep_vec=True)
    cand = probes.join(cells, "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(cosine_expr("qe", "ce"), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "cosine"
        )
        .filter(F.col("rank") <= k)
    )


def _normalized(
    corpus: DataFrame, id_col: str, vec_col: str, dim: int | None = None
) -> DataFrame:
    """(vec_id, ne): unit-normalized double vector (norm projected once).
    With dim known, both the norm and the per-element division unroll to
    static arithmetic (same values as the transform/fold forms)."""
    # nullif: a zero-norm vector normalizes to NULL elements instead of
    # throwing DIVIDE_BY_ZERO under ANSI (Spark errors on double x/0 too,
    # unlike IEEE); its encode scores go NULL and both engines tie-break
    # it to code 0 (Spark struct-min NULLS FIRST on the score field ==
    # DuckDB ASC NULLS LAST over all-NULL, both fall to code asc)
    if dim is None:
        return corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_e"),
            F.expr(f"nullif({_NORM.format(v=vec_col)}, 0.0)").alias("_nrm"),
        ).select(
            "vec_id", F.expr("transform(_e, x -> CAST(x AS DOUBLE) / _nrm)").alias("ne")
        )
    elems = ", ".join(f"(CAST(_e[{i}] AS DOUBLE) / _nrm)" for i in range(dim))
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_e"),
        F.expr(f"nullif({_norm_unrolled_sql(vec_col, dim)}, 0.0)").alias("_nrm"),
    ).select("vec_id", F.expr(f"array({elems})").alias("ne"))


def _codebook_entries(
    sample: list[list[float]], m: int, ksub: int
) -> list[tuple[int, int, float, list[float]]]:
    """(sub, code, cc, center) for the m·ksub linspace codebook, built on
    the driver from the bounded ordered sample. center = subspace slice of
    the normalized sample row at position (code·mx) div (ksub−1); cc =
    |center|² with the engine's left-assoc op order. Sorted by (sub, code)
    by construction, so entries for subspace j are exactly
    [j·ksub, (j+1)·ksub)."""
    if ksub < 2:
        raise ValueError(f"ksub must be >= 2, got {ksub}")
    dim = len(sample[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    mx = len(sample) - 1
    ne_cache: dict[int, list[float]] = {}
    entries = []
    for sub in range(m):
        for code in range(ksub):
            rn = (code * mx) // (ksub - 1)
            ne = ne_cache.setdefault(rn, _py_normalize(sample[rn]))
            center = ne[sub * dsub : (sub + 1) * dsub]
            entries.append((sub, code, _py_dot(center, center), center))
    return entries


def _codebook_array(spark, entries) -> DataFrame:
    """ONE broadcast row: array<struct<sub, code, cc, center>> — the whole
    codebook rides along each corpus task; the corpus side never shuffles
    (and no sample job re-runs per downstream use)."""
    # pure-SQL literal → LocalRelation (see _pivot_array)
    structs = ", ".join(
        f"named_struct('sub', CAST({int(sub)} AS INT), "
        f"'code', CAST({int(code)} AS INT), "
        f"'cc', {sql_literal(cc, 'double')}, "
        f"'center', {sql_literal(center, 'array<double>')})"
        for sub, code, cc, center in entries
    )
    return F.broadcast(spark.sql(f"SELECT array({structs}) AS cbs"))


def _code_col_exprs(m: int, ksub: int, dsub: int | None = None) -> list[Column]:
    """_c0.._c{m-1}: argmin-distance code per subspace, as narrow column
    expressions over the normalized vector `ne` and the broadcast one-row
    codebook array `cbs` — the zero-exchange encode.

    Each subspace's argmin is a higher-order
    `array_min(transform(slice(cbs, ...), ...))` — no per-code row
    explosion, no window, no Exchange between the corpus scan and the code
    output (the former row_number formulation shuffled corpus × m × ksub
    rows). Scoring key is d²-without-the-constant: |c|² − 2·a·c (the |a|²
    term is constant per (vector, subspace) and cannot move the argmin),
    rounded to 6 dp before the argmin so engines agree on ties (broken by
    code asc via the struct comparison) — the same left-assoc fold
    arithmetic as before, so codes (and the DuckDB oracles) are
    unchanged."""
    code_cols = []
    for j in range(m):
        if dsub is not None:
            # Unrolled direct indexing: same left-assoc per-element-DOUBLE
            # sum as the fold (values unchanged); lambda bodies are never
            # Janino-compiled, so this is a pure interpreter win.
            terms = " + ".join(
                f"(CAST(ne[{j * dsub + i}] AS DOUBLE) * CAST(e.center[{i}] AS DOUBLE))"
                for i in range(dsub)
            )
            dot = f"(CAST(0.0 AS DOUBLE) + {terms})"
        else:
            dot = (
                f"aggregate(zip_with(slice(ne, {j} * (size(ne) div {m}) + 1, "
                f"(size(ne) div {m})), e.center, "
                "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        score = f"e.cc - 2 * {dot}"
        code_cols.append(
            F.expr(
                f"array_min(transform(slice(cbs, {j * ksub + 1}, {ksub}), "
                f"e -> struct(round({score}, 6) AS s, e.code AS c))).c"
            ).alias(f"_c{j}")
        )
    return code_cols


def _pq_codes(
    normalized: DataFrame, cb1: DataFrame, m: int, ksub: int, dsub: int | None = None
) -> DataFrame:
    """(vec_id, sub, code): the m-byte PQ code in long form — the operator
    that writes a persisted compressed index at scale (FAISS `add()`:
    id + m codes per row, 32× smaller than raw float32 vectors). Narrow
    zero-exchange encode (see _code_col_exprs) + an explode."""
    wide = normalized.crossJoin(cb1).select("vec_id", *_code_col_exprs(m, ksub, dsub))
    pairs = F.array(
        *[
            F.struct(F.lit(j).cast("int").alias("sub"), F.col(f"_c{j}").alias("code"))
            for j in range(m)
        ]
    )
    return wide.select("vec_id", F.explode(pairs).alias("sc")).select(
        "vec_id", F.col("sc.sub").alias("sub"), F.col("sc.code").alias("code")
    )


def _pq_query_tables(spark, qrows, id_type, entries, m: int, ksub: int) -> DataFrame:
    """(query_id, dt): the asymmetric distance table per query as ONE flat
    array — dt[sub·ksub + code] = |q_sub − center|². Built on the driver
    (queries are a bounded set by contract — the trained pq_topk collects
    them too) and broadcast, so corpus-side ADC scoring is m array lookups
    + a fixed-order sum in a narrow projection: no join on (sub, code), no
    re-aggregation shuffle. d² = |q_sub|² + |center|² − 2·q_sub·center
    with the engine's left-assoc op order, so values are bit-identical to
    a relational recomputation (and to the DuckDB oracle)."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    rows = []
    for qid, qe in qrows:
        if _py_dot(qe, qe) == 0.0:
            # zero-norm query: undefined ADC distances — a NULL table, so
            # every approx_cosine is NULL and ranks fall to neighbor_id
            # asc, exactly what the oracle computes (0/0 → NULL in DuckDB)
            rows.append((qid, [None] * (m * ksub)))
            continue
        ne = _py_normalize(qe)
        dsub = len(ne) // m
        dt = [0.0] * (m * ksub)
        for sub, code, cc, center in entries:
            sv = ne[sub * dsub : (sub + 1) * dsub]
            aa = _py_dot(sv, sv)
            dt[sub * ksub + code] = aa + cc - 2 * _py_dot(sv, center)
        rows.append((qid, dt))
    # LocalRelation fast path (see _pivot_array); createDataFrame fallback
    # for exotic id types
    id_sql = id_type.simpleString()
    if rows and id_sql in ("bigint", "int", "string", "double"):
        return F.broadcast(
            values_df(spark, rows, f"query_id {id_sql}, dt array<double>")
        )
    schema = StructType(
        [
            StructField("query_id", id_type),
            StructField("dt", ArrayType(DoubleType())),
        ]
    )
    return F.broadcast(spark.createDataFrame(rows, schema))


def pq_topk_relational(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    k: int = 3,
    sample_limit: int = 4096,
    index_cache_key: str | None = None,
) -> DataFrame:
    """PQ top-k via asymmetric distance computation, Spark-native: the
    corpus is scanned ONCE through the zero-exchange encode projection
    (codes as m wide columns), the per-query distance tables broadcast as
    flat arrays, and scoring is m array lookups + a fixed-order sum in the
    same narrow projection — no join on (sub, code), no re-aggregation
    shuffle; the only Exchange left is the per-query top-k window. On
    normalized vectors L2² = 2 − 2·cos, so approx_cosine = 1 − d²/2 and
    asc-d² ranking is desc-cosine. Values (and the DuckDB oracle) are
    unchanged from the long-form join+sum formulation."""
    spark = corpus.sparkSession

    def build():
        sample = _ordered_sample(corpus, id_col, vec_col, sample_limit)
        if not sample:  # empty corpus → empty top-k (probe, r11)
            return None, None
        dim = len(sample[0])
        dsub = dim // m
        entries = _codebook_entries(sample, m, ksub)
        cn = _normalized(corpus, id_col, vec_col, dim)
        wide = cn.crossJoin(_codebook_array(spark, entries)).select(
            "vec_id", *_code_col_exprs(m, ksub, dsub)
        )
        return entries, wide

    memo_key = (
        None
        if index_cache_key is None
        else (session_key(spark), index_cache_key, "pq", id_col, vec_col, m, ksub, sample_limit)
    )
    entries, wide = _index_artifacts(memo_key, build)
    if entries is None:
        return _empty_topk(corpus, id_col, "approx_cosine")
    id_type, qrows = _collect_queries(corpus.filter(query_filter), id_col, vec_col)
    qdt = _pq_query_tables(spark, qrows, id_type, entries, m, ksub)
    lookup = " + ".join(f"dt[{j * ksub} + _c{j}]" for j in range(m))
    scored = (
        wide.crossJoin(qdt)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.lit(1.0) - F.expr(f"({lookup})") / 2, 6).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "approx_cosine"
        )
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk_relational(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    k: int = 3,
    sample_limit: int = 4096,
    index_cache_key: str | None = None,
) -> DataFrame:
    """IVF-PQ composed (the FAISS IVFADC layout, Spark-native): pivot cells
    prune WHICH codes a query scans, PQ codes shrink WHAT is scanned. The
    corpus is scanned ONCE through a single narrow projection computing
    BOTH the cell id and the m code columns (zero Exchange — guarded);
    candidates come from a broadcast probe join on cell, and ADC scoring
    is m broadcast-table lookups + a fixed-order sum — no join on
    (sub, code), no re-aggregation shuffle. At scale the encoded corpus is
    written once partitioned by cell (id + m codes per row) and a query
    reads nprobe/ncells of that already-compressed table."""
    spark = corpus.sparkSession

    def build():
        sample = _ordered_sample(corpus, id_col, vec_col, sample_limit)
        if not sample:  # empty corpus → empty top-k (probe, r11)
            return None, None, None
        dim = len(sample[0])
        dsub = dim // m
        pivots = _pivot_rows(sample, ncells)
        piv1 = _pivot_array(spark, pivots)
        entries = _codebook_entries(sample, m, ksub)
        # one corpus scan computes BOTH the cell id and the m code columns
        # in a single narrow projection — each vector is encoded exactly
        # once (encoding per candidate pair would duplicate work × the
        # number of queries probing its cell); candidates then come from
        # the broadcast probe join on cell and ADC scoring is m
        # broadcast-table lookups
        norm_elems = ", ".join(
            f"(CAST(ce[{i}] AS DOUBLE) / _nrm)" for i in range(dim)
        )
        # nullif: a zero-norm corpus vector would throw DIVIDE_BY_ZERO in
        # the ne projection under ANSI (the guard _normalized/_assign_cells
        # already carry); NULL elements make every code score NULL so the
        # argmin falls to code 0 and the pivot score falls to cell 0 —
        # identical to the DuckDB oracle's 0/0 → NULL convention
        encoded = (
            corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("ce"))
            .crossJoin(piv1)
            .crossJoin(_codebook_array(spark, entries))
            .withColumn("_nrm", F.expr(f"nullif({_NORM.format(v='ce')}, 0.0)"))
            .withColumn("cell", _nearest_cell_expr("ce", "_nrm", dim))
            .withColumn("ne", F.expr(f"array({norm_elems})"))
            .select("nid", "cell", *_code_col_exprs(m, ksub, dsub))
        )
        return pivots, entries, encoded

    memo_key = (
        None
        if index_cache_key is None
        else (
            session_key(spark), index_cache_key, "ivfpq",
            id_col, vec_col, ncells, m, ksub, sample_limit,
        )
    )
    pivots, entries, encoded = _index_artifacts(memo_key, build)
    if pivots is None:
        return _empty_topk(corpus, id_col, "approx_cosine")
    id_type, qrows = _collect_queries(corpus.filter(query_filter), id_col, vec_col)
    probes = _probe_local(spark, qrows, id_type, pivots, nprobe, keep_vec=False)
    qdt = _pq_query_tables(spark, qrows, id_type, entries, m, ksub)
    lookup = " + ".join(f"dt[{j * ksub} + _c{j}]" for j in range(m))
    scored = (
        probes.join(encoded, "cell")
        .filter(F.col("nid") != F.col("query_id"))
        .join(qdt, "query_id")
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(F.lit(1.0) - F.expr(f"({lookup})") / 2, 6).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "approx_cosine"
        )
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------------------
# Persisted IVF-PQ index — the write-once / pruned-read layout the query
# functions above only simulate in one plan. At 100 TB the encode pass
# runs ONCE: the corpus is written partitioned by cell with m small-int
# code columns per row (~32× smaller than raw float32 vectors), and the
# tiny quantizer artifacts (pivots + codebook) persist beside it. A query
# session then rebuilds the broadcast tables from the artifacts WITHOUT
# touching the corpus and scans only its probed cells — partition pruning
# at the file-listing level, guarded by test_similarity_pq.py.
# --------------------------------------------------------------------------


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 8,
    m: int = 8,
    ksub: int = 16,
    sample_limit: int = 4096,
) -> None:
    """Materialize the IVF-PQ index at `path`: `codes/` (id, m code
    columns; partitioned by cell), `pivots/`, `codebook/`. The encode is
    the same zero-exchange narrow projection as ivfpq_topk_relational, so
    a query over the persisted index returns exactly what the inline plan
    returns (equality pinned in tests)."""
    spark = corpus.sparkSession
    sample = _ordered_sample(corpus, id_col, vec_col, sample_limit)
    if not sample:
        # materializing an index of NOTHING is a caller error — unlike
        # the inline top-k queries, stay loud here
        raise ValueError(
            "corpus has no non-zero-norm rows — cannot build an ANN index"
        )
    dim = len(sample[0])
    dsub = dim // m
    pivots = _pivot_rows(sample, ncells)
    entries = _codebook_entries(sample, m, ksub)
    norm_elems = ", ".join(f"(CAST(ce[{i}] AS DOUBLE) / _nrm)" for i in range(dim))
    # nullif guard: same zero-norm convention as ivfpq_topk_relational, so
    # the persisted index is bit-identical to the inline plan on hostile
    # corpora too (equality pinned in test_similarity_pq.py)
    encoded = (
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("ce"))
        .crossJoin(_pivot_array(spark, pivots))
        .crossJoin(_codebook_array(spark, entries))
        .withColumn("_nrm", F.expr(f"nullif({_NORM.format(v='ce')}, 0.0)"))
        .withColumn("cell", _nearest_cell_expr("ce", "_nrm", dim))
        .withColumn("ne", F.expr(f"array({norm_elems})"))
        .select("nid", "cell", *_code_col_exprs(m, ksub, dsub))
    )
    encoded.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")
    spark.createDataFrame(
        pivots, "cell int, pe array<double>, pn double"
    ).write.mode("overwrite").parquet(f"{path}/pivots")
    spark.createDataFrame(
        entries, "sub int, code int, cc double, center array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebook")


def query_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    k: int = 3,
) -> DataFrame:
    """Top-k over a persisted IVF-PQ index: rebuild the broadcast
    quantizer tables from the (tiny) persisted artifacts, compute each
    query's probe list on the driver, and scan ONLY the probed cell
    partitions of the code table (`cell IN (...)` reaches the parquet
    partition filter). ADC scoring and ranking are identical to
    ivfpq_topk_relational — same values, same ordering."""
    pivots = [
        (r.cell, [float(x) for x in r.pe], r.pn)
        for r in sorted(
            spark.read.parquet(f"{path}/pivots").collect(), key=lambda r: r.cell
        )
    ]
    entries = [
        (r.sub, r.code, r.cc, [float(x) for x in r.center])
        for r in sorted(
            spark.read.parquet(f"{path}/codebook").collect(),
            key=lambda r: (r.sub, r.code),
        )
    ]
    m = entries[-1][0] + 1
    ksub = entries[-1][1] + 1
    id_type, qrows = _collect_queries(queries, id_col, vec_col)
    probes = _probe_local(spark, qrows, id_type, pivots, nprobe, keep_vec=False)
    qdt = _pq_query_tables(spark, qrows, id_type, entries, m, ksub)
    probed = sorted({r.cell for r in probes.collect()})
    codes = spark.read.parquet(f"{path}/codes").filter(F.col("cell").isin(probed))
    lookup = " + ".join(f"dt[{j * ksub} + _c{j}]" for j in range(m))
    scored = (
        probes.join(codes, "cell")
        .filter(F.col("nid") != F.col("query_id"))
        .join(qdt, "query_id")
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(F.lit(1.0) - F.expr(f"({lookup})") / 2, 6).alias("approx_cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "approx_cosine"
        )
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8): per-dimension uint8 codes — the cheapest
# compression tier of a vector index (4x smaller than float32, exact ADC
# arithmetic; the entry tier below PQ in faiss-style index taxonomies).
#
# Scale shape: the per-dim min/max "codebook" is ONE full-scan aggregate
# with 2*dim scalar min/max columns (map-side partial agg, single-row
# result — no explode, no shuffle of row-multiplied data), and encode +
# asymmetric scoring is a NARROW unrolled projection over the broadcast
# stats, so the only exchange in the whole query is the final top-k
# (TakeOrderedAndProject). Mirrors the zero-exchange encode rule the
# PQ/IVF family follows.
# ---------------------------------------------------------------------------
def sq8_stats(corpus: DataFrame, vec_col: str, dim: int) -> list[tuple[float, float]]:
    """[(vmin, vmax)] per dimension — posexplode + groupBy(dim) aggregate.

    Bounded metadata collect (2*dim scalars), same class as the ANN pivot
    tables: at 100 TB this row IS the persisted index header. The explode
    looks row-multiplying but isn't in shuffle terms: partial aggregation
    combines within each input partition, so the exchange carries only
    dim × n_partitions rows — the same volume as a 2·dim-column wide
    aggregate, at a fraction of its plan size (the wide form spends ~2 s
    per run in Catalyst/codegen for a 64-dim vector before touching data).
    """
    v = F.col("v").cast("double")
    rows = (
        corpus.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.min(v).alias("mn"), F.max(v).alias("mx"))
        .collect()
    )
    by_pos = {r["pos"]: (r["mn"], r["mx"]) for r in rows}
    missing = [i for i in range(dim) if i not in by_pos]
    if missing:
        # empty corpus or ragged/short vectors: fail with the cause, not
        # a bare KeyError from the comprehension below
        raise ValueError(
            f"sq8_stats: no values observed for dimension(s) {missing[:8]}"
            f"{'...' if len(missing) > 8 else ''} of {dim} — corpus is empty "
            f"or vectors are shorter than dim={dim}"
        )
    return [by_pos[i] for i in range(dim)]


def sq8_topk(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Asymmetric top-k under SQ8: dequantized corpus x raw query vector.

    The query is the lowest-id vector (raw, unquantized — ADC style); every
    corpus vector is scored through its uint8 reconstruction:

        code_i = clamp(floor((v_i - mn_i) / (mx_i - mn_i) * 255), 0, 255)
        dq_i   = mn_i + code_i * (mx_i - mn_i) / 255
        score  = sum_i dq_i * q_i      (left-to-right, double precision)

    Constant dimensions (mx == mn) reconstruct to the constant. All
    arithmetic is engine-portable: the DuckDB oracle evaluates the same
    parenthesization, so scores hash-match cell-for-cell.
    """
    qrow = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(1).collect()
    )
    if not qrow:  # empty corpus → empty top-k (probe, r11)
        return _empty_topk(corpus, id_col, "score_sq8")
    qid = qrow[0][id_col]
    qvec = [float(x) for x in qrow[0][vec_col]]
    dim = len(qvec)
    stats = sq8_stats(corpus, vec_col, dim)

    # Score as one zip_with/aggregate fold over three constant-folded
    # literal arrays (mins, maxes, query vector). Identical left-to-right
    # double arithmetic to an unrolled 64-term chain — the fold IS a
    # left-to-right sum — but the plan is O(1) expressions instead of
    # O(dim), which cuts ~2 s of Catalyst/codegen per run. (At extreme
    # per-row volumes the unrolled straight-line codegen form can win
    # back per-row cost; the exchange profile is identical — none.)
    def _arr(vals: list[float]) -> str:
        return "array(" + ",".join(f"CAST({x!r} AS DOUBLE)" for x in vals) + ")"

    mn_a, mx_a, q_a = (
        _arr([s[0] for s in stats]),
        _arr([s[1] for s in stats]),
        _arr(qvec),
    )
    score = F.expr(
        f"""aggregate(
              zip_with({vec_col}, sequence(0, {dim - 1}), (v, i) ->
                CASE WHEN element_at({mx_a}, i+1) = element_at({mn_a}, i+1)
                     THEN element_at({mn_a}, i+1) * element_at({q_a}, i+1)
                     ELSE (element_at({mn_a}, i+1)
                           + floor(least(greatest(
                               (CAST(v AS DOUBLE) - element_at({mn_a}, i+1))
                               / (element_at({mx_a}, i+1) - element_at({mn_a}, i+1))
                               * 255.0, 0.0), 255.0))
                             * (element_at({mx_a}, i+1) - element_at({mn_a}, i+1))
                             / 255.0)
                          * element_at({q_a}, i+1)
                END),
              CAST(0.0 AS DOUBLE), (a, x) -> a + x)"""
    )

    scored = (
        corpus.filter(F.col(id_col) != F.lit(qid))
        .select(
            F.lit(qid).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(score, 6).alias("score_sq8"),
        )
        .orderBy(F.desc("score_sq8"), F.asc("neighbor_id"))
        .limit(k)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_sq8"), F.asc("neighbor_id"))
    return scored.select(
        "query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "score_sq8"
    )
