"""Property pins for the DF_CAP contract introduced in round 7
(operators/dedup.py:DF_CAP — boilerplate shingles are dropped before the
exact verifiers' self-join, in Spark AND the DuckDB oracles).

Locks three semantics with hypothesis fuzzing plus one documented
non-property:

1. NOOP BELOW THE CAP — on any corpus where every shingle's document
   frequency is ≤ cap, the capped verifier output is identical to the
   uncapped one (the cap only ever removes hot keys, it never perturbs
   cold ones).
2. CAPPED RELATION MONOTONE IN CAP — the capped shingle RELATION grows
   monotonically with the cap (relation(c) ⊆ relation(c') for c ≤ c'),
   and equals exactly the rows whose shingle df ≤ cap.
3. ENGINE PARITY — Spark's df_capped_shingles and the oracle's DuckDB
   window filter produce the identical relation on random corpora.

NON-property (pinned by counterexample so nobody "fixes" it later): the
THRESHOLDED pair set is NOT monotone in the cap. Raising the cap can
admit a shingle present in doc A but not doc B, growing |A| while
|A∩B| stays fixed, pushing jaccard(A,B) BELOW the threshold — so a
pair can appear at a small cap and vanish at a larger one. The cap is
part of the operator's semantics, not a recall knob.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_pipeline_spark.operators.dedup import (
    DF_CAP,
    containment_pairs,
    df_capped_shingles,
    jaccard_pairs,
)

# Small vocabulary so random docs actually collide on shingles; docs are
# (doc_id, [shingle...]) directly — the shingling transform itself is
# pinned elsewhere (test_operators_dedup.py), these tests own the cap.
_VOCAB = [f"s{i}" for i in range(12)]

_corpus = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=6, unique=True),
    min_size=2,
    max_size=10,
)


def _shingle_rows(docs):
    return [(i, s) for i, doc in enumerate(docs) for s in doc]


def _shingle_df(spark, docs):
    return spark.createDataFrame(
        _shingle_rows(docs), "doc_id bigint, shingle string"
    )


def _pairs_set(df):
    return {tuple(r) for r in df.collect()}


@settings(max_examples=8, deadline=None)
@given(_corpus)
def test_cap_is_noop_when_max_df_below_cap(spark, docs):
    """Property 1: cap ≥ max observed df ⇒ capped == uncapped, for both
    exact verifiers (jaccard and containment)."""
    sh = _shingle_df(spark, docs)
    max_df = max(
        (sum(s in doc for doc in docs) for s in _VOCAB), default=0
    )
    for fn, thr in ((jaccard_pairs, 0.3), (containment_pairs, 0.6)):
        capped = _pairs_set(fn(sh, thr, df_cap=max(max_df, 1)))
        uncapped = _pairs_set(fn(sh, thr, df_cap=None))
        assert capped == uncapped


@settings(max_examples=8, deadline=None)
@given(_corpus, st.integers(min_value=1, max_value=6))
def test_capped_relation_monotone_and_exact(spark, docs, cap):
    """Property 2: relation(cap) ⊆ relation(cap+1), and relation(cap) is
    EXACTLY the rows whose shingle df ≤ cap (pure-Python recount)."""
    sh = _shingle_df(spark, docs)
    small = {tuple(r) for r in df_capped_shingles(sh, cap).collect()}
    big = {tuple(r) for r in df_capped_shingles(sh, cap + 1).collect()}
    assert small <= big
    df_count = {}
    for _, s in _shingle_rows(docs):
        df_count[s] = 0
    for doc in docs:
        for s in set(doc):
            if s in df_count:
                df_count[s] += 1
    expect = {
        (i, s) for i, s in _shingle_rows(docs) if df_count[s] <= cap
    }
    assert small == expect


@settings(max_examples=8, deadline=None)
@given(_corpus, st.integers(min_value=1, max_value=4))
def test_spark_and_duckdb_capped_relations_identical(spark, docs, cap):
    """Property 3: the oracle's window filter (COUNT(*) OVER (PARTITION
    BY shingle) <= cap — the exact SQL shape plans/llm.py ships) yields
    the same relation as df_capped_shingles on random corpora."""
    rows = _shingle_rows(docs)
    spark_rel = {
        tuple(r) for r in df_capped_shingles(_shingle_df(spark, docs), cap).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE sh (doc_id BIGINT, shingle VARCHAR)")
    con.executemany("INSERT INTO sh VALUES (?, ?)", rows or [(None, None)])
    if not rows:
        con.execute("DELETE FROM sh")
    duck_rel = {
        (r[0], r[1])
        for r in con.execute(
            f"""
            SELECT doc_id, shingle FROM (
                SELECT doc_id, shingle,
                       COUNT(*) OVER (PARTITION BY shingle) AS df
                FROM sh
            ) WHERE df <= {cap}
            """
        ).fetchall()
    }
    con.close()
    assert spark_rel == duck_rel


def test_thresholded_pairs_not_monotone_in_cap(spark):
    """The documented NON-property: raising the cap can DROP a pair.
    Docs A and B share their only cold shingle; A additionally holds a
    hot shingle (df = 3). cap=2 drops the hot shingle → jaccard(A,B) =
    1/1 = 1.0; cap=3 keeps it → |A| = 2, jaccard = 1/2 < 0.9."""
    docs = [
        ["cold", "hot"],  # A
        ["cold"],         # B
        ["hot"],          # C  (df(hot) = 3 with D)
        ["hot"],          # D
    ]
    sh = _shingle_df(spark, docs)
    at_cap2 = _pairs_set(jaccard_pairs(sh, 0.9, df_cap=2))
    at_cap3 = _pairs_set(jaccard_pairs(sh, 0.9, df_cap=3))
    assert any(p[0] == 0 and p[1] == 1 for p in at_cap2)
    assert not any(p[0] == 0 and p[1] == 1 for p in at_cap3)


def test_default_cap_is_wired_through_registered_queries():
    """The registered queries inherit DF_CAP as their default — a retune
    of the constant retunes the whole contract (oracles interpolate the
    same constant; tests/test_scale_plans.py guards the plan shape)."""
    import inspect

    assert inspect.signature(jaccard_pairs).parameters["df_cap"].default is DF_CAP
    assert (
        inspect.signature(containment_pairs).parameters["df_cap"].default is DF_CAP
    )
