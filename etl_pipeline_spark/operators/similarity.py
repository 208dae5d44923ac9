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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
    """cos(a, b) as a Column over two array<float|double> columns."""
    return F.expr(_DOT.format(a=a, b=b)) / (
        F.expr(_NORM.format(v=a)) * F.expr(_NORM.format(v=b))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, rank, cosine)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"))
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
) -> DataFrame:
    """Embedding-space near-dup pairs (all-pairs; gate behind buckets at
    scale): (vec_a, vec_b, cosine ≥ threshold)."""
    a = corpus.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    b = corpus.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    cos = cosine_expr("ea", "eb").alias("cosine")
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos)
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
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
# PQ code compression, IVF-PQ composed) with a SQL-expressible quantizer:
# pivots/codebook centers are linspace-positioned rows of the bounded
# ordered sample, i.e. exactly the k-means INIT the trained variants use
# (0 Lloyd iterations). Everything below is pure DataFrame algebra — no
# UDFs, no driver-side training — so a DuckDB oracle can recompute the
# complete output and the driver value-checks neighbors cell-for-cell
# (plans/llm.py). The k-means-trained variants above stay the quality
# path, pinned by recall tests (test_similarity_ivf.py / _pq.py).
#
# Determinism discipline shared with the oracles:
# - pivot row = (i · max_rn) div (n_pivots - 1): integer arithmetic only;
# - ranking keys are ROUNDED (cosine and encode scores → 6 dp) BEFORE
#   row_number, ties broken by id — so last-ulp float differences between
#   engines (or between partial-agg orders) can never flip a rank.
# --------------------------------------------------------------------------


# Interpreted higher-order folds (aggregate/zip_with) cost a lambda eval
# per element; with the dimension known at plan time the same sums unroll
# to static codegen-able arithmetic. Bit-identity: the fold computes
# 0.0 + p0 + p1 + … left-associated with per-element DOUBLE casts — the
# unrolled forms reproduce exactly that AST, so rounded outputs (and the
# DuckDB oracles) are unchanged.


def _vec_dim(corpus: DataFrame, vec_col: str) -> int:
    """Array length from one row (schemas don't carry list lengths)."""
    row = corpus.select(vec_col).first()
    return len(row[0])


def _dot_unrolled_sql(a: str, b: str, dim: int) -> str:
    terms = " + ".join(
        f"(CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE))" for i in range(dim)
    )
    return f"(CAST(0.0 AS DOUBLE) + {terms})"


def _norm_unrolled_sql(v: str, dim: int) -> str:
    terms = " + ".join(
        f"(CAST({v}[{i}] AS DOUBLE) * CAST({v}[{i}] AS DOUBLE))" for i in range(dim)
    )
    return f"sqrt(CAST(0.0 AS DOUBLE) + {terms})"


def _sample_with_rn(corpus: DataFrame, id_col: str, vec_col: str, sample_limit: int) -> DataFrame:
    """Bounded ordered sample (rn, v): first `sample_limit` rows by id,
    rn = 0-based position. TakeOrdered keeps this a bounded top-k scan —
    never a global sort of the corpus."""
    s = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample_limit)
    )
    w = Window.orderBy("i")
    return s.withColumn("rn", F.row_number().over(w) - 1)


def _linspace_pivots(
    corpus: DataFrame, id_col: str, vec_col: str, n_pivots: int, sample_limit: int
) -> DataFrame:
    """(cell, pe): `n_pivots` Voronoi pivots = evenly-spaced sample rows."""
    spark = corpus.sparkSession
    s = _sample_with_rn(corpus, id_col, vec_col, sample_limit)
    mx = s.agg(F.max("rn").alias("mx"))
    cells = spark.range(n_pivots).select(F.col("id").cast("int").alias("cell"))
    return (
        cells.crossJoin(mx)
        .withColumn("rn", F.expr(f"(cell * mx) div {n_pivots - 1}"))
        .join(s, "rn")
        .select("cell", F.col("v").alias("pe"))
    )


def ivf_topk_relational(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ncells: int = 8,
    nprobe: int = 2,
    k: int = 3,
    sample_limit: int = 4096,
) -> DataFrame:
    """IVF top-k with the pivot quantizer: assign each corpus vector to its
    nearest pivot's cell (broadcast 8-row pivot table — a narrow map-side
    scan), probe each query's `nprobe` nearest cells, exact cosine inside
    candidates. At 100 TB the corpus is written partitioned by `cell`, so
    the candidate join is a pruned scan of nprobe/ncells of the data.

    Cosines stay in the higher-order-function fold form: measured against
    the 64-term static unroll, steady-state is comparable but the unroll
    pays ~7 s of one-time Janino compilation for the giant expressions —
    the wrong trade for a query that runs once per session. (The PQ path
    below unrolls its 8-term subspace dots, where compile cost is small
    and the win is real.)"""
    piv = F.broadcast(_linspace_pivots(corpus, id_col, vec_col, ncells, sample_limit))
    c_scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce"))
        .crossJoin(piv)
        .select("neighbor_id", "ce", "cell", F.round(cosine_expr("ce", "pe"), 6).alias("cs"))
    )
    w_assign = Window.partitionBy("neighbor_id").orderBy(F.desc("cs"), F.asc("cell"))
    cells = (
        c_scored.withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select("neighbor_id", "ce", "cell")
    )
    q_scored = (
        corpus.filter(query_filter)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
        .crossJoin(piv)
        .select("query_id", "qe", "cell", F.round(cosine_expr("qe", "pe"), 6).alias("cs"))
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("cell"))
    probes = (
        q_scored.withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "qe", "cell")
    )
    cand = F.broadcast(probes).join(cells, "cell").filter(
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
    if dim is None:
        return corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_e"),
            F.expr(_NORM.format(v=vec_col)).alias("_nrm"),
        ).select(
            "vec_id", F.expr("transform(_e, x -> CAST(x AS DOUBLE) / _nrm)").alias("ne")
        )
    elems = ", ".join(f"(CAST(_e[{i}] AS DOUBLE) / _nrm)" for i in range(dim))
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_e"),
        F.expr(_norm_unrolled_sql(vec_col, dim)).alias("_nrm"),
    ).select("vec_id", F.expr(f"array({elems})").alias("ne"))


def _pq_codebook(
    normalized: DataFrame, m: int, ksub: int, sample_limit: int
) -> DataFrame:
    """(sub, code, center): per-subspace codebook = subslices of linspace-
    positioned normalized sample rows. m·ksub rows — broadcasts."""
    spark = normalized.sparkSession
    s = _sample_with_rn(normalized, "vec_id", "ne", sample_limit)
    mx = s.agg(F.max("rn").alias("mx"))
    subs = spark.range(m).select(F.col("id").cast("int").alias("sub"))
    codes = spark.range(ksub).select(F.col("id").cast("int").alias("code"))
    dsub = f"(size(v) div {m})"
    return (
        subs.crossJoin(codes)
        .crossJoin(mx)
        .withColumn("rn", F.expr(f"(code * mx) div {ksub - 1}"))
        .join(s, "rn")
        .select("sub", "code", F.expr(f"slice(v, sub * {dsub} + 1, {dsub})").alias("center"))
    )


def _subvectors(normalized: DataFrame, m: int) -> DataFrame:
    """(vec_id, sub, sv): one slice per (vector, subspace) — m rows per
    vector, each 64-dim array sliced exactly once (slicing per codebook
    CODE would cost ksub× more interpreted array work for nothing)."""
    return normalized.select(
        "vec_id", "ne", F.explode(F.expr(f"sequence(0, {m - 1})")).alias("sub")
    ).select(
        "vec_id",
        "sub",
        F.expr(f"slice(ne, sub * (size(ne) div {m}) + 1, size(ne) div {m})").alias("sv"),
    )


def _pq_dot(a: str, b: str, dsub: int | None) -> Column:
    """Subspace dot: unrolled when the subspace width is known."""
    if dsub is None:
        return F.expr(_DOT.format(a=a, b=b))
    return F.expr(_dot_unrolled_sql(a, b, dsub))


def _cb_with_norms(cb: DataFrame, dsub: int | None = None) -> DataFrame:
    """Codebook + |center|² precomputed once per codebook row (m·ksub rows)
    instead of once per (vector, subspace, code) score evaluation."""
    return cb.withColumn("cc", _pq_dot("center", "center", dsub))


def _pq_codes(
    normalized: DataFrame, cb: DataFrame, m: int, dsub: int | None = None
) -> DataFrame:
    """(vec_id, sub, code): argmin-distance code per (vector, subspace).
    Scoring key is d²-without-the-constant: |c|² − 2·a·c (the |a|² term is
    constant per (vector, subspace) and cannot move the argmin), rounded
    to 6 dp before ranking so engines agree on ties (broken by code).
    Value-identical to evaluating on full vectors — the subvector slice
    and |c|² are precomputed, the fold order is unchanged."""
    score = F.col("cc") - 2 * _pq_dot("sv", "center", dsub)
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("s9"), F.asc("code"))
    return (
        _subvectors(normalized, m)
        .join(F.broadcast(_cb_with_norms(cb, dsub)), "sub")
        .select("vec_id", "sub", "code", F.round(score, 6).alias("s9"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "sub", "code")
    )


def _pq_dtable(
    queries_norm: DataFrame, cb: DataFrame, m: int, dsub: int | None = None
) -> DataFrame:
    """(query_id, sub, code, d2): full asymmetric distance table for the
    bounded query set — |q_sub − center|² via the dot identity, with
    |q_sub|² computed once per (query, subspace)."""
    qsv = _subvectors(queries_norm, m).withColumn("aa", _pq_dot("sv", "sv", dsub))
    d2 = F.col("aa") + F.col("cc") - 2 * _pq_dot("sv", "center", dsub)
    return qsv.join(F.broadcast(_cb_with_norms(cb, dsub)), "sub").select(
        F.col("vec_id").alias("query_id"), "sub", "code", d2.alias("d2")
    )


def pq_topk_relational(
    corpus: DataFrame,
    query_filter: Column,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    k: int = 3,
    sample_limit: int = 4096,
) -> DataFrame:
    """PQ top-k, fully relational: corpus scanned as m small codes, scoring
    is a broadcast join against the query distance table + one sum — the
    ADC pattern with zero Python. On normalized vectors L2² = 2 − 2·cos,
    so approx_cosine = 1 − d²/2 and asc-d² ranking is desc-cosine."""
    dim = _vec_dim(corpus, vec_col)
    dsub = dim // m
    cn = _normalized(corpus, id_col, vec_col, dim)
    cb = _pq_codebook(cn, m, ksub, sample_limit)
    codes = _pq_codes(cn, cb, m, dsub)
    qn = _normalized(corpus.filter(query_filter), id_col, vec_col, dim)
    dtable = _pq_dtable(qn, cb, m, dsub)
    summed = (
        codes.join(F.broadcast(dtable), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.round(F.lit(1.0) - F.sum("d2") / 2, 6).alias("approx_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        summed.select(
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
) -> DataFrame:
    """IVF-PQ composed, fully relational: pivot cells prune WHICH codes a
    query scans, PQ codes shrink WHAT is scanned. At scale the encoded
    corpus is written once partitioned by cell (id + m codes per row) and
    a query reads nprobe/ncells of that already-compressed table."""
    dim = _vec_dim(corpus, vec_col)
    dsub = dim // m
    piv = F.broadcast(_linspace_pivots(corpus, id_col, vec_col, ncells, sample_limit))
    c_scored = (
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("ce"))
        .crossJoin(piv)
        .select("nid", "cell", F.round(cosine_expr("ce", "pe"), 6).alias("cs"))
    )
    w_assign = Window.partitionBy("nid").orderBy(F.desc("cs"), F.asc("cell"))
    cells = (
        c_scored.withColumn("r", F.row_number().over(w_assign))
        .filter(F.col("r") == 1)
        .select("nid", "cell")
    )
    q_scored = (
        corpus.filter(query_filter)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qe"))
        .crossJoin(piv)
        .select("query_id", "cell", F.round(cosine_expr("qe", "pe"), 6).alias("cs"))
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("cell"))
    probes = (
        q_scored.withColumn("r", F.row_number().over(w_probe))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "cell")
    )
    cand = F.broadcast(probes).join(cells, "cell").filter(
        F.col("nid") != F.col("query_id")
    )

    cn = _normalized(corpus, id_col, vec_col, dim)
    cb = _pq_codebook(cn, m, ksub, sample_limit)
    codes = _pq_codes(cn, cb, m, dsub)
    qn = _normalized(corpus.filter(query_filter), id_col, vec_col, dim)
    dtable = _pq_dtable(qn, cb, m, dsub)
    summed = (
        cand.join(codes, cand["nid"] == codes["vec_id"])
        .join(F.broadcast(dtable), ["query_id", "sub", "code"])
        .groupBy("query_id", F.col("nid").alias("neighbor_id"))
        .agg(F.round(F.lit(1.0) - F.sum("d2") / 2, 6).alias("approx_cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor_id")
    )
    return (
        summed.select(
            "query_id", "neighbor_id", F.row_number().over(w).alias("rank"), "approx_cosine"
        )
        .filter(F.col("rank") <= k)
    )
