"""Operator-library tests on arbitrary data — proving the dedup/similarity
operators generalize beyond the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingles,
)
from etl_pipeline_spark.operators.similarity import cosine_pairs, cosine_topk

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "the quick brown fox jumps over the lazy cat tonight"),  # near-dup of 1
    (3, "completely different text about spark query engines here"),
    (4, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
]


def test_exact_dedup_generic(spark):
    df = spark.createDataFrame(DOCS, "id bigint, body string")
    out = {r.canonical_id: r.n_copies for r in exact_dedup(df, "id", "body").collect()}
    assert out[1] == 2  # docs 1+4 merged, min id kept
    assert out[2] == 1 and out[3] == 1


def test_minhash_agrees_with_exact_jaccard(spark):
    df = spark.createDataFrame(DOCS, "id bigint, body string")
    sh = shingles(df, "id", "body", 3)
    exact = {
        (r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(sh, 0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(df, "id", "body", threshold=0.5).collect()
    }
    # identical docs → jaccard 1.0; near-dup pair found by both paths
    assert exact[(1, 4)] == 1.0
    assert (1, 2) in exact and 0.5 <= exact[(1, 2)] < 1.0
    # LSH with identical signatures must catch exact dups; near-dups at
    # j≈0.6 are probabilistic per band — verified values must agree where found
    assert lsh[(1, 4)] == 1.0
    for pair, j in lsh.items():
        assert exact[pair] == j  # LSH-verified jaccard equals exact jaccard


def test_cosine_topk_known_geometry(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),   # orthogonal to 1
        (4, [-1.0, 0.0, 0.0]),  # opposite to 1
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    out = cosine_topk(df, df.filter(F.col("vec_id") == 1), k=3).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == [2, 3, 4]  # by descending cosine: 0.994, 0.0, -1.0
    assert out[0].cosine == pytest.approx(0.993884, abs=1e-6)


def test_cosine_pairs_threshold(spark):
    vecs = [(1, [1.0, 0.0]), (2, [0.8, 0.6]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in cosine_pairs(df, threshold=0.7).collect()}
    assert (1, 2) in pairs  # cos = 0.8
    assert (2, 3) not in pairs or pairs[(2, 3)] >= 0.7  # cos = 0.6 → excluded
    assert (1, 3) not in pairs  # orthogonal
