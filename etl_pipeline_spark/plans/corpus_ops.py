"""Round-3 corpus operators: winnowing fingerprints, chunk-level exact
dedup, CDC merge, SQ8 vector compression, and an ANN recall evaluator.

Each query is the Spark-first expression of a standard large-corpus
primitive the reference-scale pipeline would need next:

- winnowing (Schleimer et al., SIGMOD'03) — content-addressed document
  fingerprints with a guaranteed-detection bound, the MOSS algorithm;
- chunk-level exact dedup — the token-window variant of exact-substring
  training-data dedup (16-token windows; near-free detection of copied
  passages that whole-doc hashing misses);
- CDC merge — ANSI MERGE semantics (latest-wins upsert + delete) as one
  full-outer join, the incremental-load primitive;
- SQ8 — per-dimension uint8 scalar quantization with asymmetric scoring,
  the cheapest vector-index compression tier;
- ANN recall@k — the eval-harness query that scores an approximate index
  against the exact ranking, in-engine.

Every query carries a complete-output DuckDB oracle; float scores are
rounded (6 dp) on identical parenthesization so values hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.cdc import merge_changeset
from etl_pipeline_spark.operators.fingerprint import (
    shared_fingerprint_pairs,
    winnow_fingerprints,
)
from etl_pipeline_spark.operators.similarity import cosine_topk, sign_lsh_topk, sq8_topk
from etl_pipeline_spark.plans.llm import _BUCKET_DIMS, _BUCKET_DUCK, _COS_DUCK
from etl_pipeline_spark.plans.registry import register
from etl_pipeline_spark.sources.embeddings import EMB_VALID_ORACLE, load_embeddings
from etl_pipeline_spark.sources.star import load_table


# --------------------------------------------------------------------------
# Winnowing fingerprint pairs: char-16-gram md5, window-of-8 minima,
# stop-fingerprint cap (df <= 10), equi-join on fingerprint, pairs
# sharing >= 8 fingerprints. Any shared substring of length >= k + w - 1
# (= 23 chars, ~4 tokens) is guaranteed to contribute a shared
# fingerprint. Tuned against the corpus's planted near-duplicates: at
# sf0.01 the pair set is exactly the 25 pairs the exact Jaccard>=0.5
# verifier finds — zero false positives — so winnowing serves as a third,
# independent near-dup detector next to MinHash-LSH and SimHash.
# --------------------------------------------------------------------------
@register(
    "winnow_fingerprint_pairs",
    oracle="""
        WITH grams AS (
            SELECT doc_id,
                   greatest(len(text) - 15, 1) AS n_grams,
                   unnest(generate_series(1, greatest(len(text) - 15, 1))) AS pos
            FROM documents
        ),
        hashed AS (
            SELECT g.doc_id, g.n_grams, g.pos, md5(substr(d.text, g.pos, 16)) AS h
            FROM grams g JOIN documents d USING (doc_id)
        ),
        winnowed AS (
            SELECT DISTINCT doc_id, fp FROM (
                SELECT doc_id, pos, n_grams,
                       min(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
                FROM hashed
            )
            WHERE pos <= greatest(n_grams - 7, 1)
        ),
        kept AS (
            SELECT fp FROM winnowed GROUP BY fp
            HAVING COUNT(*) BETWEEN 2 AND 10
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM winnowed a
        JOIN kept USING (fp)
        JOIN winnowed b USING (fp)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 8
    """,
    tags=("llm", "text", "dedup", "fingerprint"),
)
def winnow_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # persist: the pairing stage references the fingerprint relation three
    # times (df counts + both join sides) — without this the Arrow
    # fingerprint pass re-runs per reference (measured 6.4 s -> ~3.5 s at
    # sf0.1). At true scale this is the "write the fingerprint index to
    # parquet once" step.
    fps = winnow_fingerprints(docs, k=16, w=8).persist()
    return shared_fingerprint_pairs(fps, min_shared=8, max_df=10)


# --------------------------------------------------------------------------
# Chunk-level exact dedup: non-overlapping 16-token windows hashed per doc;
# a chunk present in >1 document marks a copied passage. Per-doc report =
# the dedup decision input (drop / trim docs whose dup ratio is high).
# One narrow projection (chunking is transform/sequence), one shuffle on
# the chunk hash for document frequency — scales like exact dedup.
# --------------------------------------------------------------------------
@register(
    "dedup_chunk_exact",
    oracle="""
        WITH chunks AS (
            SELECT doc_id, c,
                   md5(array_to_string(
                       list_slice(string_split(text, ' '), c * 16 + 1, c * 16 + 16),
                       ' ')) AS chash
            FROM (
                SELECT doc_id, text,
                       unnest(generate_series(
                           0, CAST(ceil(len(string_split(text, ' ')) / 16.0e0) AS BIGINT) - 1
                       )) AS c
                FROM documents
            )
        ),
        freq AS (
            SELECT chash, COUNT(DISTINCT doc_id) AS n_docs
            FROM chunks GROUP BY chash
        )
        SELECT doc_id,
               COUNT(*) AS n_chunks,
               CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_chunks,
               ROUND(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
                   AS dup_ratio
        FROM chunks JOIN freq f USING (chash)
        GROUP BY doc_id
    """,
    tags=("llm", "text", "dedup"),
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # bind the token array ONCE below the generator: inlining
    # split(text,' ') into the per-chunk lambda re-splits the string per
    # chunk — O(tokens²/chunk_size) character work per doc (measured
    # 0.99 -> 0.65 s at sf0.1 from this binding alone)
    chunks = docs.select(
        "doc_id", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, CAST(ceil(size(toks) / 16.0e0) AS INT) - 1),"
                " c -> md5(concat_ws(' ', slice(toks, c * 16 + 1, 16))))"
            )
        ).alias("c", "chash"),
    )
    freq = chunks.groupBy("chash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        chunks.join(freq, on="chash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(F.col("n_dup_chunks") * 1.0 / F.col("n_chunks"), 6).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------------
# CDC merge: a deterministic change stream derived from orders (two
# batches, latest-wins; deletes at %12, upserts at %3 and %6, inserts
# where the upsert key is outside the base slice), applied with ONE
# full-outer join (operators/cdc.py). The standard MERGE INTO re-expressed
# relationally; AQE broadcasts the (small) collapsed change side at scale.
# --------------------------------------------------------------------------
@register(
    "cdc_merge_orders",
    oracle="""
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_totalprice AS price
            FROM orders WHERE o_orderkey % 4 <> 3
        ),
        changes AS (
            SELECT o_orderkey, 1 AS seq, 'U' AS op, o_custkey,
                   (CAST(ROUND(o_totalprice * 100) AS BIGINT) * 105) / CAST(10000 AS DOUBLE) AS price
            FROM orders WHERE o_orderkey % 3 = 0
            UNION ALL
            SELECT o_orderkey, 2 AS seq,
                   CASE WHEN o_orderkey % 12 = 0 THEN 'D' ELSE 'U' END AS op,
                   o_custkey,
                   (CAST(ROUND(o_totalprice * 100) AS BIGINT) * 110) / CAST(10000 AS DOUBLE) AS price
            FROM orders WHERE o_orderkey % 6 = 0
        ),
        latest AS (
            SELECT * FROM (
                SELECT c.*, ROW_NUMBER() OVER (
                    PARTITION BY o_orderkey ORDER BY seq DESC, op) AS rn
                FROM changes c
            ) WHERE rn = 1
        )
        SELECT COALESCE(b.o_orderkey, l.o_orderkey) AS o_orderkey,
               COALESCE(l.o_custkey, b.o_custkey) AS o_custkey,
               COALESCE(l.price, b.price) AS price,
               CASE WHEN l.op IS NULL THEN 'unchanged'
                    WHEN b.o_orderkey IS NULL THEN 'inserted'
                    ELSE 'updated' END AS src
        FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.o_orderkey
        WHERE l.op IS NULL OR l.op <> 'D'
    """,
    tags=("relational", "cdc", "merge"),
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # change prices via exact integer-cents arithmetic (cents * pct / 10000)
    # instead of ROUND(x * 1.05, 2): a 2-dp round of a 4-dp product sits on
    # a decimal midpoint for ~0.06% of rows, where Spark (HALF_UP) and
    # DuckDB (HALF_EVEN on doubles) disagree — integer scaling is exact in
    # both engines.
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    base = orders.filter(F.col("o_orderkey") % 4 != 3).select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").alias("price")
    )
    chg1 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        "o_custkey",
        ((cents * 105) / F.lit(10000.0)).alias("price"),
    )
    chg2 = orders.filter(F.col("o_orderkey") % 6 == 0).select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        F.when(F.col("o_orderkey") % 12 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "o_custkey",
        ((cents * 110) / F.lit(10000.0)).alias("price"),
    )
    return merge_changeset(
        base, chg1.unionByName(chg2), key="o_orderkey",
        payload_cols=["o_custkey", "price"],
    )


# --------------------------------------------------------------------------
# SQ8 scalar-quantized top-k (operators/similarity.py::sq8_topk). The
# oracle recomputes the identical arithmetic — per-dim min/max CTE, same
# clamp/floor/dequantize parenthesization, same left-to-right score fold.
# --------------------------------------------------------------------------
_SQ8_DIM = 64


def _sq8_oracle(dim: int) -> str:
    stats_cols = ", ".join(
        f"min(CAST(embedding[{i + 1}] AS DOUBLE)) AS mn{i}, "
        f"max(CAST(embedding[{i + 1}] AS DOUBLE)) AS mx{i}"
        for i in range(dim)
    )
    terms = []
    for i in range(dim):
        v = f"CAST(c.embedding[{i + 1}] AS DOUBLE)"
        mn, mx = f"s.mn{i}", f"s.mx{i}"
        code = (
            f"floor(least(greatest(((({v} - {mn}) / ({mx} - {mn})) * 255.0), 0.0), 255.0))"
        )
        dq = f"CASE WHEN {mx} = {mn} THEN {mn} ELSE ({mn} + (({code} * ({mx} - {mn})) / 255.0)) END"
        terms.append(f"({dq} * CAST(q.embedding[{i + 1}] AS DOUBLE))")
    score = "0.0"
    for t in terms:
        score = f"({score} + {t})"
    return f"""
        WITH s AS (SELECT {stats_cols} FROM {EMB_VALID_ORACLE} embeddings),
        q AS (SELECT vec_id AS qid, embedding FROM {EMB_VALID_ORACLE} embeddings
              ORDER BY vec_id LIMIT 1)
        SELECT query_id, neighbor_id, rank, score_sq8
        FROM (
            SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
                   ROUND({score}, 6) AS score_sq8,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND({score}, 6) DESC, c.vec_id) AS rank
            FROM {EMB_VALID_ORACLE} c, s, q
            WHERE c.vec_id <> q.qid
        )
        WHERE rank <= 10
    """


@register(
    "embedding_sq8_topk",
    oracle=_sq8_oracle(_SQ8_DIM),
    tags=("llm", "similarity", "quantization"),
)
def embedding_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    return sq8_topk(emb, k=10)


# --------------------------------------------------------------------------
# ANN recall@3: score the sign-LSH bucketed index against the exact
# cosine ranking, per query, entirely in-engine — the eval harness every
# approximate index needs. Left join keeps queries whose bucket found
# nothing (recall 0) visible instead of silently dropping them.
# --------------------------------------------------------------------------
@register(
    "ann_recall_eval",
    oracle=f"""
        WITH exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_COS_DUCK} DESC, c.vec_id) AS rank
                FROM {EMB_VALID_ORACLE} q
                JOIN {EMB_VALID_ORACLE} c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
            ) WHERE rank <= 3
        ),
        b AS (
            SELECT vec_id, embedding, {_BUCKET_DUCK} AS bucket FROM {EMB_VALID_ORACLE} embeddings
        ),
        approx AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_COS_DUCK} DESC, c.vec_id) AS rank
                FROM b q
                JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
                        AND q.vec_id < 10
            ) WHERE rank <= 3
        )
        SELECT e.query_id,
               CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_matched,
               ROUND(COUNT(a.neighbor_id) / 3.0, 6) AS recall_at_3
        FROM exact e
        LEFT JOIN approx a
          ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        GROUP BY e.query_id
    """,
    tags=("llm", "similarity", "eval"),
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=3).select(
        "query_id", "neighbor_id"
    )
    approx = sign_lsh_topk(emb, F.col("vec_id") < 10, dims=_BUCKET_DIMS, k=3).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    return (
        exact.join(
            approx,
            (F.col("query_id") == F.col("aq")) & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("an").alias("n_matched"))
        .select(
            "query_id",
            "n_matched",
            F.round(F.col("n_matched") / 3.0, 6).alias("recall_at_3"),
        )
    )
