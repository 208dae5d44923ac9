"""Semantics tests for the round-3 corpus operators (winnowing, chunk
dedup, CDC merge, SQ8) — oracle parity is covered by test_oracle_parity;
these pin the algorithmic guarantees on hand-built inputs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_pipeline_spark.operators.cdc import merge_changeset
from etl_pipeline_spark.operators.fingerprint import (
    shared_fingerprint_pairs,
    winnow_fingerprints,
)
from etl_pipeline_spark.operators.similarity import sq8_stats, sq8_topk


# ---------------------------------------------------------------- CDC merge
def _base(spark):
    return spark.createDataFrame(
        [(1, 10, 100.0), (2, 20, 200.0), (3, 30, 300.0)],
        "k bigint, cust bigint, price double",
    )


def test_cdc_merge_latest_wins_delete(spark):
    changes = spark.createDataFrame(
        [(2, 1, "U", 21, 210.0), (2, 2, "D", 21, 0.0), (4, 1, "U", 40, 400.0)],
        "k bigint, seq int, op string, cust bigint, price double",
    )
    out = {
        r.k: r
        for r in merge_changeset(
            _base(spark), changes, key="k", payload_cols=["cust", "price"]
        ).collect()
    }
    assert set(out) == {1, 3, 4}  # key 2: delete wins over the earlier upsert
    assert out[1].src == "unchanged" and out[1].price == 100.0
    assert out[3].src == "unchanged"
    assert out[4].src == "inserted" and out[4].cust == 40 and out[4].price == 400.0


def test_cdc_merge_update_applies_latest_version(spark):
    changes = spark.createDataFrame(
        [(3, 1, "U", 30, 301.0), (3, 2, "U", 30, 302.0)],
        "k bigint, seq int, op string, cust bigint, price double",
    )
    out = {
        r.k: r
        for r in merge_changeset(
            _base(spark), changes, key="k", payload_cols=["cust", "price"]
        ).collect()
    }
    assert out[3].src == "updated" and out[3].price == 302.0
    assert out[1].src == "unchanged" and out[2].src == "unchanged"


# ------------------------------------------------------------- winnowing
def test_winnow_detects_shared_substring(spark):
    # guarantee: a shared substring of length >= k + w - 1 (= 11 chars)
    # contributes at least one shared fingerprint
    shared = "zqxwvutsrqponm"  # 14 chars, appears in both docs
    docs = spark.createDataFrame(
        [(1, "aaaa bbbb " + shared + " cccc"), (2, "dd " + shared + " ee ff gg")],
        "doc_id bigint, text string",
    )
    fps = winnow_fingerprints(docs, k=8, w=4)
    a = {r.fp for r in fps.filter("doc_id = 1").collect()}
    b = {r.fp for r in fps.filter("doc_id = 2").collect()}
    assert a & b, "shared 14-char substring must produce a common fingerprint"


def test_winnow_short_doc_still_fingerprinted(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    fps = winnow_fingerprints(docs, k=8, w=4).collect()
    assert len(fps) == 1  # one hash of the whole (short) text


def test_winnow_null_rows_produce_nothing(spark):
    """NULL doc_id / NULL text rows vanish (SQL null semantics). Pins the
    vectorized kernel's NaN path: a nullable BIGINT id crosses Arrow →
    pandas as float NaN, and the in-kernel engine must treat that NaN as
    NULL (not a value) exactly like the old pd.isna row filter did."""
    docs = spark.createDataFrame(
        [(None, "abcdefghijklmnop"), (2, None), (3, "abcdefghijklmnop")],
        "doc_id bigint, text string",
    )
    rows = winnow_fingerprints(docs, k=8, w=4).collect()
    assert rows and all(r.doc_id == 3 for r in rows)


def test_winnow_kernel_matches_reference_python(spark):
    """The vectorized kernel emits the same (doc_id, fp) SET as a direct
    Python transliteration of the winnowing definition."""
    import hashlib

    texts = ["the quick brown fox jumps", "abc", "aaaaaaaaaaaa", "x y z w v u t s"]
    docs = spark.createDataFrame(
        list(enumerate(texts, 1)), "doc_id bigint, text string"
    )
    k, w = 8, 4
    expect = set()
    for did, text in enumerate(texts, 1):
        ng = max(len(text) - k + 1, 1)
        grams = [
            hashlib.md5(text[i : i + k].encode()).hexdigest() for i in range(ng)
        ]
        for p in range(max(ng - w + 1, 1)):
            expect.add((did, min(grams[p : p + w])))
    got = {(r.doc_id, r.fp) for r in winnow_fingerprints(docs, k=k, w=w).collect()}
    assert got == expect


def test_shared_pairs_respects_df_cap(spark):
    # a fingerprint present in every doc is a stop-fingerprint at max_df=2
    docs = spark.createDataFrame(
        [(i, "commonword" * 3) for i in range(1, 5)], "doc_id bigint, text string"
    )
    fps = winnow_fingerprints(docs, k=8, w=4)
    pairs = shared_fingerprint_pairs(fps, min_shared=1, max_df=2).collect()
    assert pairs == []  # df=4 > cap → dropped, no pairs


# ------------------------------------------------------------------ SQ8
def test_sq8_reconstruction_error_bounded(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    stats = sq8_stats(emb, "embedding", 64)
    # quantization step per dim
    steps = [(mx - mn) / 255.0 for mn, mx in stats]
    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    q = [float(x) for x in qrow.embedding]
    # |score_sq8 - exact dot| <= sum_i |q_i| * step_i for every neighbor
    bound = sum(abs(qi) * si for qi, si in zip(q, steps)) + 1e-6
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    qv = np.array(q)
    for r in sq8_topk(emb, k=10).collect():
        exact_dot = float(vecs[r.neighbor_id] @ qv)
        assert abs(r.score_sq8 - exact_dot) <= bound


def test_sq8_empty_corpus_returns_empty(spark):
    # r11 empty-input convention: an empty corpus yields an EMPTY top-k
    # with the documented schema (the oracle's empty sample CTE produces
    # the same zero rows), not a driver-side ValueError
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = sq8_topk(empty)
    assert out.columns == ["query_id", "neighbor_id", "rank", "score_sq8"]
    assert out.count() == 0
