"""Cross-engine fuzz for the shared-SQL kernels on HOSTILE random data.

The driver's oracle parity and the local three-SF sweep prove Spark ==
DuckDB on the fixture corpus; these tests prove the engine-portable SQL
kernels (the pieces whose IDENTICAL text runs in both engines) agree on
inputs the fixtures never contain — negative and huge ids, unicode,
empty strings, single-token and repeated-token documents. A divergence
here is a latent wrong-answer on user data, found before a user does.

Kernels covered:
- ``hash_u32_sql`` / ``hash_bucket_sql`` / ``split_label_sql``
  (operators/sampling.py) — the deterministic split/sample labels
- ``hex8_at_expr`` portable vs fast decode and cross-engine
  (operators/sketch.py) — the seeded minhash/CMS/bootstrap hash family
- ``hll_cell_sql`` (operators/sketch.py) — HLL register index / rho
- word-shingling: ``operators.dedup.shingles`` vs the DuckDB
  string_split CTE the oracles use (plans/llm.py)
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# ids: negatives, zero, huge 63-bit values
_ids = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=12, unique=True
)

# keys: printable unicode incl. quotes and spaces (no surrogates; parquet/
# arrow-safe), plus the empty string
_keys = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
        ),
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=10,
    unique=True,
)

_words = st.lists(
    st.text(alphabet="abcdefgh√ü√©", min_size=1, max_size=4),
    min_size=0,
    max_size=9,
)


def _duck(df: pd.DataFrame, sql: str) -> list:
    con = duckdb.connect()
    con.register("t", df)
    out = con.execute(sql).fetchall()
    con.close()
    return out


@settings(max_examples=10, deadline=None)
@given(_ids)
def test_split_label_sql_identical_across_engines(spark, ids):
    from etl_pipeline_spark.operators.sampling import (
        hash_bucket_sql,
        split_label_sql,
    )

    weights = {"train": 0.8, "valid": 0.1, "test": 0.1}
    bucket = hash_bucket_sql("id", "r1")
    label = split_label_sql("id", "r1", weights)
    sdf = spark.createDataFrame([(i,) for i in ids], "id bigint")
    got = {
        r.id: (r.b, r.s)
        for r in sdf.select(
            "id", F.expr(bucket).alias("b"), F.expr(label).alias("s")
        ).collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in _duck(
            pd.DataFrame({"id": pd.Series(ids, dtype="int64")}),
            f"SELECT id, {bucket} AS b, {label} AS s FROM t",
        )
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(_keys)
def test_hex8_decode_fast_portable_and_cross_engine(spark, keys):
    from etl_pipeline_spark.operators.sketch import hex8_at_expr

    fast = hex8_at_expr("k", 3, fast=True)
    portable = hex8_at_expr("k", 3, fast=False)
    sdf = spark.createDataFrame([(k,) for k in keys], "k string")
    rows = sdf.select(
        "k", F.expr(fast).alias("f"), F.expr(portable).alias("p")
    ).collect()
    for r in rows:
        assert r.f == r.p, f"fast vs portable diverge on {r.k!r}"
    want = dict(
        _duck(
            pd.DataFrame({"k": keys}),
            f"SELECT k, {portable} AS p FROM t",
        )
    )
    for r in rows:
        assert r.p == want[r.k], f"engines diverge on {r.k!r}"


@settings(max_examples=10, deadline=None)
@given(_keys)
def test_hll_cell_sql_identical_across_engines(spark, keys):
    from etl_pipeline_spark.operators.sketch import hll_cell_sql

    idx, rho = hll_cell_sql("k", 8)
    sdf = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.k: (r.i, r.r)
        for r in sdf.select(
            "k", F.expr(idx).alias("i"), F.expr(rho).alias("r")
        ).collect()
    }
    want = {
        row[0]: (row[1], row[2])
        for row in _duck(
            pd.DataFrame({"k": keys}),
            f"SELECT k, {idx} AS i, {rho} AS r FROM t",
        )
    }
    assert got == want


_SHINGLE_DUCK = """
    SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 2),
               i -> string_split(text, ' ')[i] || ' ' ||
                    string_split(text, ' ')[i+1] || ' ' ||
                    string_split(text, ' ')[i+2]))) AS shingle
    FROM t
"""


_DUCK_SANITIZE = """
    substr(
      CASE WHEN regexp_matches(<C>, '^[0-9]') THEN '_' || <C> ELSE <C> END,
      1, 128)
""".replace(
    "<C>",
    "regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace("
    "lower(translate(k, 'åäöÅÄÖ', 'aaoAAO')),"
    " '[^a-z0-9_-]+', '_', 'g'), '_+', '_', 'g'),"
    " '-', '_', 'g'), '_+', '_', 'g'), '^_+|_+$', '', 'g')",
)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
            ),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_sanitize_name_matches_oracle_chain(spark, names):
    """functions/naming.py::sanitize_name (Java regex, Spark) vs the exact
    regexp_replace chain the kernel oracle ships (DuckDB RE2) — on random
    unicode. The two regex engines differ in exotic corners; the chain is
    designed so every non-[a-z0-9_-] codepoint collapses to '_' BEFORE
    any engine-specific behavior can surface, and this fuzz pins that
    design actually holds."""
    from etl_pipeline_spark.functions.naming import sanitize_name

    sdf = spark.createDataFrame([(k,) for k in names], "k string")
    got = {r.k: r.s for r in sdf.select("k", sanitize_name("k").alias("s")).collect()}
    want = dict(
        _duck(
            pd.DataFrame({"k": names}),
            f"SELECT k, {_DUCK_SANITIZE} AS s FROM t",
        )
    )
    assert got == want


def test_dedup_pipeline_survives_hostile_docs(spark):
    """End-to-end: the full near-dup pipeline (shingles → minhash → LSH →
    exact verify) runs without error on a corpus containing empty,
    1-token, and 2-token documents (pre-fix these crashed with
    INVALID_ARRAY_INDEX under ANSI mode), and sub-n docs simply emit no
    pairs."""
    from etl_pipeline_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
        shingles,
    )

    docs = [
        (1, ""),
        (2, "one"),
        (3, "two words"),
        (4, "the quick brown fox jumps over the dog"),
        (5, "the quick brown fox jumps over the dog"),
    ]
    df = spark.createDataFrame(docs, "id bigint, body string")
    sh = shingles(df, "id", "body", 3)
    assert {r.doc_id for r in sh.select("doc_id").distinct().collect()} == {4, 5}
    exact = {(r.doc_a, r.doc_b) for r in jaccard_pairs(sh, 0.5).collect()}
    assert exact == {(4, 5)}
    lsh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(df, "id", "body", threshold=0.5).collect()
    }
    assert lsh == {(4, 5)}


_M30_NS = 30 * 60 * 1_000_000_000
# gaps hammer the boundary: exactly 30m (same session: rule is >), one ns
# over (new session), zero (duplicate ts — the tie-break class)
_gaps = st.sampled_from([0, 1, _M30_NS - 1, _M30_NS, _M30_NS + 1, 7_000_000_000])


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.integers(1, 3), st.lists(_gaps, min_size=1, max_size=10), min_size=1, max_size=3
    )
)
def test_sessionize_matches_duckdb_on_ties_and_boundaries(spark, keyed):
    """sessionize_30m vs the oracle SQL shape on random event streams with
    DUPLICATE timestamps and exact-30m gaps. Ordered-by-ts-alone
    cumulative windows diverge between engines on ties; the event_id
    tie-break (round-8 fix) makes both deterministic and equal."""
    from etl_pipeline_spark.plans.streaming_batch import sessionize_30m

    rows, eid = [], 0
    for user, gaps in keyed.items():
        t = 1_000_000_000_000
        for g in gaps:
            t += g
            rows.append((eid, user, t, float((eid % 7) + 0.25)))
            eid += 1
    sdf = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts bigint, value double")
    got = {
        (r.user_id, r.session_nr): (
            r.session_start_epoch, r.session_end_epoch, r.n_events, r.total_value
        )
        for r in sessionize_30m(sdf).collect()
    }
    duck_sql = f"""
        WITH seq AS (
            SELECT user_id, event_id, ts AS t, value,
                   CASE WHEN ts - LAG(ts) OVER w > {_M30_NS}
                        OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
            FROM t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tagged AS (
            SELECT user_id, t, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY t, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_nr
            FROM seq
        )
        SELECT user_id, CAST(session_nr AS BIGINT) AS session_nr,
               MIN(t) // 1000000000 AS s, MAX(t) // 1000000000 AS e,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS v
        FROM tagged GROUP BY user_id, session_nr
    """
    want = {
        (row[0], row[1]): (row[2], row[3], row[4], row[5])
        for row in _duck(
            pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"]), duck_sql
        )
    }
    assert got == want


_coords = st.floats(min_value=-50, max_value=50, allow_nan=False).map(
    lambda v: round(v, 1)  # coarse grid → on-edge / on-vertex collisions
)
_ring = st.lists(st.tuples(_coords, _coords), min_size=3, max_size=7)
_points = st.lists(st.tuples(_coords, _coords), min_size=1, max_size=15)


@settings(max_examples=10, deadline=None)
@given(_ring, _points)
# r11-found: decimal-typed SQL literals made `1.0 - 1.9` exact where the
# UDF's double arithmetic rounds — one ULP flipped the crossing test for a
# point landing exactly on the (0,1) vertex. pip_sql_predicate now casts
# every ring literal to DOUBLE; this example pins that.
@example(ring=[(0.0, 0.0), (1.0, 1.9), (0.0, 1.0)], points=[(0.0, 1.0)])
def test_pip_udf_matches_sql_and_duckdb(spark, ring, points):
    """Even-odd ray cast: the Arrow UDF (functions/geo.py::
    points_in_polygon), its SQL unrolling (pip_sql_predicate) evaluated
    by Spark, AND the same SQL evaluated by DuckDB must agree point-for-
    point on ARBITRARY closed rings (self-intersecting and degenerate
    rings included — parity semantics are well-defined for any closed
    polyline) with points deliberately landing on vertices and edges."""
    from etl_pipeline_spark.functions.geo import (
        pip_sql_predicate,
        points_in_polygon,
    )

    pred = pip_sql_predicate("x", "y", ring)
    if pred == "() % 2 = 1":  # fully-horizontal ring: no crossing terms
        pred = "FALSE"
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(points)]
    sdf = spark.createDataFrame(rows, "pid bigint, x double, y double")
    udf_in = {r.pid for r in points_in_polygon(sdf, "x", "y", ring).collect()}
    sql_in = {r.pid for r in sdf.where(F.expr(pred)).collect()}
    duck_in = {
        row[0]
        for row in _duck(
            pd.DataFrame(rows, columns=["pid", "x", "y"]),
            f"SELECT pid FROM t WHERE {pred}",
        )
    }
    assert udf_in == sql_in == duck_in


def test_similarity_operators_survive_zero_vectors(spark):
    """Zero-norm embeddings are undefined-cosine, not a crash and not a
    fake best match: cosine_topk returns them last-or-never (NULL sorts
    below every real cosine under DESC), cosine_pairs never pairs them
    above threshold, and the IVF probe path (driver-side Python) does
    not raise ZeroDivisionError on a zero-norm query."""
    from etl_pipeline_spark.operators.similarity import (
        cosine_pairs,
        cosine_topk,
        ivf_topk,
    )
    from pyspark.sql import functions as F

    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 0.0, 0.0]),  # hostile: zero norm
        (4, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<double>")
    top = cosine_topk(df, df.filter(F.col("vec_id") == 1), k=2).collect()
    assert [r.neighbor_id for r in top] == [2, 4]  # zero vector never wins
    assert all(r.cosine is not None for r in top)
    pairs = cosine_pairs(df, threshold=0.5).collect()
    assert all(3 not in (r.vec_a, r.vec_b) for r in pairs)
    # zero-norm QUERY through the IVF probe (driver-side cosine ranking)
    ivf_topk(
        df, F.col("vec_id") == 3, ncells=2, nprobe=2, k=2
    ).collect()  # must not raise


def test_text_operators_survive_hostile_docs(spark):
    """Every arbitrary-DataFrame text operator handles empty / 1-token /
    whitespace-only documents without ANSI errors (the shingles() crash
    class): chunking, contamination, repetition metrics, winnowing,
    simhash-style token hashing via repetition_metrics' bigram arm."""
    from etl_pipeline_spark.operators.fingerprint import winnow_fingerprints
    from etl_pipeline_spark.operators.textprep import (
        chunk_tokens,
        eval_contamination,
        repetition_metrics,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "two words"),
         (4, "a b c d e f g h i j k l m")],
        "doc_id bigint, text string",
    )
    chunks = chunk_tokens(docs, "doc_id", chunk_size=4, stride=4)
    assert chunks.count() >= 4  # every doc emits >= 1 chunk (even empty)
    cont = eval_contamination(docs, F.col("doc_id") == 4, min_common=1)
    cont.count()  # must not raise
    rep = repetition_metrics(docs, "doc_id", "text")
    rep.count()
    fp = winnow_fingerprints(docs.select("doc_id", "text"), k=8, w=4)
    fp.count()


@settings(max_examples=8, deadline=None)
@given(st.lists(st.lists(st.sampled_from([f"w{i}" for i in range(9)]), min_size=3, max_size=8), min_size=2, max_size=6))
def test_minhash_lsh_candidates_match_duckdb(spark, docs):
    """The full MinHash→banding→candidate chain on random corpora:
    Spark operators (minhash_signatures + lsh_candidates) vs the oracle's
    sigs/bands/candidates SQL — signature strings AND the candidate pair
    set must agree exactly (the LSH path's correctness rests on byte-
    identical band keys in both engines)."""
    from etl_pipeline_spark.operators.dedup import (
        lsh_candidates,
        minhash_signatures,
        shingles,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = shingles(sdf, "doc_id", "text", 3)
    sigs = minhash_signatures(sh, 8)
    got_sigs = {tuple(r) for r in sigs.collect()}
    got_cands = {tuple(r) for r in lsh_candidates(sigs, 8, 2).collect()}
    aggs = ",\n".join(
        f"MIN(substr(md5('{i // 4}:' || shingle), {(i % 4) * 8 + 1}, 8)) AS h{i}"
        for i in range(8)
    )
    bands = ", ".join(f"({b}, md5(h{2*b} || h{2*b+1}))" for b in range(4))
    duck_sql = f"""
        WITH sh AS ({_SHINGLE_DUCK}),
        sigs AS (SELECT doc_id, {aggs} FROM sh GROUP BY doc_id),
        bands AS (
            SELECT doc_id, band_id, band_key
            FROM sigs, LATERAL (VALUES {bands}) AS b(band_id, band_key)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id
    """
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    want_sigs = {
        tuple(row)
        for row in _duck(pdf, f"WITH sh AS ({_SHINGLE_DUCK}) SELECT doc_id, {aggs} FROM sh GROUP BY doc_id")
    }
    want_cands = {tuple(row) for row in _duck(pdf, duck_sql)}
    assert got_sigs == want_sigs
    assert got_cands == want_cands


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
            ),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_bpe_ish_tokenizer_regex_matches_duckdb(spark, texts):
    """token_stats' BPE-ish tokenizer regex ('[a-z]+|[0-9]+|[^a-z0-9 ]')
    — Java regex (Spark) vs RE2 (DuckDB) token COUNTS on random unicode.
    Alternation order and per-codepoint matching must agree for the
    token-count quality signals to be engine-portable."""
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    sdf = spark.createDataFrame([(s,) for s in texts], "k string")
    got = {
        r.k: r.n
        for r in sdf.select(
            "k", F.expr(f"size(regexp_extract_all(k, '{pat}', 0))").alias("n")
        ).collect()
    }
    want = dict(
        _duck(
            pd.DataFrame({"k": texts}),
            f"SELECT k, len(regexp_extract_all(k, '{pat}')) AS n FROM t",
        )
    )
    assert got == want


_WINNOW_DUCK = """
    WITH grams AS (
        SELECT doc_id,
               greatest(len(text) - 15, 1) AS n_grams,
               unnest(generate_series(1, greatest(len(text) - 15, 1))) AS pos
        FROM t
    ),
    hashed AS (
        SELECT g.doc_id, g.n_grams, g.pos, md5(substr(d.text, g.pos, 16)) AS h
        FROM grams g JOIN t d USING (doc_id)
    )
    SELECT DISTINCT doc_id, fp FROM (
        SELECT doc_id, pos, n_grams,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp
        FROM hashed
    )
    WHERE pos <= greatest(n_grams - 7, 1)
"""


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",), max_codepoint=0x2FFF
            ),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=5,
        unique=True,
    )
)
def test_winnow_udf_matches_relational_oracle(spark, texts):
    """The hand-rolled winnowing Arrow UDF (operators/fingerprint.py —
    Python hashlib over char 16-grams, rolling window-8 minima) vs the
    oracle's relational form (exploded grams + windowed min in DuckDB)
    on random unicode text including empty and sub-16-char documents.
    Pins character (not byte) gram semantics and the short-doc branch."""
    from etl_pipeline_spark.operators.fingerprint import winnow_fingerprints

    rows = [(i, s) for i, s in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {tuple(r) for r in winnow_fingerprints(sdf, k=16, w=8).collect()}
    want = {
        tuple(row)
        for row in _duck(pd.DataFrame(rows, columns=["doc_id", "text"]), _WINNOW_DUCK)
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(_words, min_size=1, max_size=5))
def test_shingles_match_duckdb_cte(spark, docs):
    """operators.dedup.shingles (n=3) vs the exact DuckDB CTE shape the
    oracles interpolate — on random corpora including empty, 1-token,
    2-token, repeated-token, and non-ASCII documents."""
    from etl_pipeline_spark.operators.dedup import shingles

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {tuple(r) for r in shingles(sdf, "doc_id", "text", 3).collect()}
    want = {
        tuple(row)
        for row in _duck(
            pd.DataFrame(rows, columns=["doc_id", "text"]), _SHINGLE_DUCK
        )
    }
    assert got == want


# ---------------------------------------------------------------------------
# Round-9 extension: the remaining numeric kernels with engine-parity risk
# (VERDICT r8 §next-round 6): PQ encode, SQ8 encode-decode scoring, and the
# Krüger TM projection on hostile coordinates.
# ---------------------------------------------------------------------------

# embedding vectors bounded away from zero norm (the zero-norm convention
# has its own pins in test_similarity_operators_survive_zero_vectors)
def _vecs(dim, n_min, n_max):
    return st.lists(
        st.lists(
            st.floats(min_value=-8.0, max_value=8.0, allow_nan=False),
            min_size=dim,
            max_size=dim,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=n_min,
        max_size=n_max,
    )


@settings(max_examples=8, deadline=None)
@given(sample=_vecs(8, 2, 6), corpus=_vecs(8, 1, 8))
def test_pq_encode_matches_independent_argmin(spark, sample, corpus):
    """The zero-exchange PQ encode (operators/similarity._code_col_exprs —
    an array_min(transform(...)) argmin per subspace, in BOTH its unrolled
    and fold forms) vs an independent Python argmin over the same codebook:
    round-6 HALF_UP scores, ties to the lower code. Random sample AND
    corpus vectors, so codebook centers and argmin knife-edges are not
    fixture-shaped."""
    from etl_pipeline_spark.operators.similarity import (
        _codebook_array,
        _codebook_entries,
        _normalized,
        _pq_codes,
        _py_dot,
        _py_normalize,
        _round6,
    )

    m, ksub, dim = 4, 4, 8
    entries = _codebook_entries(sample, m, ksub)
    rows = [(i, v) for i, v in enumerate(corpus)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb1 = _codebook_array(spark, entries)
    norm = _normalized(df, "vec_id", "embedding")
    got_fold = {
        (r.vec_id, r.sub): r.code
        for r in _pq_codes(norm, cb1, m, ksub, dsub=None).collect()
    }
    got_unrolled = {
        (r.vec_id, r.sub): r.code
        for r in _pq_codes(norm, cb1, m, ksub, dsub=dim // m).collect()
    }
    assert got_fold == got_unrolled  # the two encode forms are value-identical

    dsub = dim // m
    want = {}
    for i, v in rows:
        ne = _py_normalize(v)
        for sub in range(m):
            sv = ne[sub * dsub : (sub + 1) * dsub]
            best = min(
                (_round6(cc - 2 * _py_dot(sv, center)), code)
                for (s_, code, cc, center) in entries
                if s_ == sub
            )
            want[(i, sub)] = best[1]
    assert got_fold == want


@settings(max_examples=8, deadline=None)
@given(corpus=_vecs(4, 2, 8))
def test_sq8_topk_matches_independent_recompute(spark, corpus):
    """The SQ8 encode-decode scoring fold (operators/similarity.sq8_topk:
    clamp/floor uint8 quantize -> dequantize -> left-assoc dot with the raw
    query) vs an independent plain-Python recomputation of the documented
    formula — including constant dimensions (mx == mn) and negative
    values, which the fixture corpus never stresses."""
    from etl_pipeline_spark.operators.similarity import _round6, sq8_topk

    # force a constant dimension sometimes: hypothesis shrinks toward
    # equal values naturally, but make dim 0 constant deterministically
    # on even-sized corpora so the CASE branch is always exercised
    if len(corpus) % 2 == 0:
        corpus = [[1.5] + v[1:] for v in corpus]
    rows = [(i, v) for i, v in enumerate(corpus)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = len(corpus)
    got = [
        (r.query_id, r.neighbor_id, r.rank, r.score_sq8)
        for r in sq8_topk(df, k=k).orderBy("rank").collect()
    ]

    import math

    qid, qvec = rows[0]
    dim = len(qvec)
    stats = [
        (min(v[i] for _, v in rows), max(v[i] for _, v in rows))
        for i in range(dim)
    ]
    scored = []
    for i, v in rows[1:]:
        s = 0.0
        for j in range(dim):
            mn, mx = stats[j]
            if mx == mn:
                dq = mn
            else:
                code = math.floor(min(max((v[j] - mn) / (mx - mn) * 255.0, 0.0), 255.0))
                dq = mn + code * (mx - mn) / 255.0
            s = s + dq * qvec[j]
        scored.append((i, _round6(s)))
    scored.sort(key=lambda t: (-t[1], t[0]))
    want = [(qid, nid, rank, sc) for rank, (nid, sc) in enumerate(scored[:k], start=1)]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    lat=st.floats(min_value=-89.9, max_value=89.9, allow_nan=False),
    epsg=st.sampled_from([3006, 3010, 3011]),
)
def test_kruger_roundtrip_or_explicit_nan(lon, lat, epsg):
    """functions/geo.py Krüger kernel on arbitrary world coordinates:
    every point either round-trips through the projection (modular
    longitude; tolerance tiered by distance from the central meridian —
    series truncation grows with |lambda|) or comes back NaN in BOTH
    outputs (the explicit out-of-domain mask near the TM singular points
    at lambda=+-90, phi=0). Silently-wrong finite coordinates are the
    failure mode this pins against."""
    import numpy as np

    from etl_pipeline_spark.functions.geo import TM_PARAMS, tm_forward, tm_inverse

    e, n = tm_forward(np.array([lon]), np.array([lat]), epsg)
    if np.isnan(e[0]) or np.isnan(n[0]):
        assert np.isnan(e[0]) and np.isnan(n[0])  # masked atomically
        return
    lo, la = tm_inverse(e, n, epsg)
    assert np.isfinite(lo[0]) and np.isfinite(la[0])
    dlon = abs((lo[0] - lon + 180.0) % 360.0 - 180.0)
    dlat = abs(la[0] - lat)
    lam = abs((lon - TM_PARAMS[epsg][0] + 180.0) % 360.0 - 180.0)
    tol = 1e-8 if lam <= 15.0 else (5e-6 if lam <= 60.0 else 5e-3)
    assert dlat < tol, (lon, lat, epsg, dlat)
    # at |lat| ~ 89.9 a fixed lon tolerance is meaningless (meridians
    # converge); scale by cos(lat) ground distance
    assert dlon * max(np.cos(np.radians(lat)), 1e-6) < tol, (lon, lat, epsg, dlon)


def test_kruger_poles_and_zone_extent_exact():
    """Fixed hostile probes: the poles project and round-trip exactly
    (latitude branch), and in-zone accuracy stays at the documented
    sub-1e-9-degree level after the round-9 domain mask (the mask must be
    a pure out-of-domain change)."""
    import numpy as np

    from etl_pipeline_spark.functions.geo import tm_forward, tm_inverse

    for lat in (90.0, -90.0):
        e, n = tm_forward(np.array([15.0]), np.array([lat]), 3006)
        lo, la = tm_inverse(e, n, 3006)
        assert la[0] == lat and np.isfinite(lo[0])
    lon = np.array([10.93, 15.0, 24.17, 11.0, 23.9])
    lat = np.array([55.2, 69.06, 65.85, 58.0, 67.4])  # Sweden-ish extent
    e, n = tm_forward(lon, lat, 3006)
    lo, la = tm_inverse(e, n, 3006)
    assert np.max(np.abs(lo - lon)) < 1e-9
    assert np.max(np.abs(la - lat)) < 1e-9
    # the garbage region is explicitly NaN now, never a plausible easting
    e, n = tm_forward(np.array([104.9, 100.0, 105.0]), np.array([0.0, 0.5, 0.0]), 3006)
    assert np.isnan(e).all() and np.isnan(n).all()


@settings(max_examples=8, deadline=None)
@given(
    vecs=_vecs(4, 2, 9),
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=10, max_size=10, unique=True
    ),
    blk=st.integers(min_value=1, max_value=4),
    thr=st.sampled_from([-0.95, -0.3, 0.0, 0.25, 0.5, 0.8]),
)
def test_cosine_pairs_gemm_matches_brute_force(spark, vecs, ids, blk, thr):
    """The blocked-GEMM exact-pairs kernel (operators/similarity.
    cosine_pairs) vs an unblocked numpy brute force over all unordered
    pairs — random SPARSE NON-CONTIGUOUS ids (the id % nb residue classes
    go uneven and some block pairs lose a side entirely), random
    block_rows so pairs straddle block boundaries, a planted zero vector
    (NaN cosine must never pass the threshold), negative thresholds."""
    import numpy as np

    from etl_pipeline_spark.operators.similarity import cosine_pairs

    rows = [(ids[i], v) for i, v in enumerate(vecs)]
    rows.append((ids[len(vecs)], [0.0, 0.0, 0.0, 0.0]))  # planted zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_pairs(df, threshold=thr, block_rows=blk).collect()
    }

    want = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, va), (ib, vb) = rows[i], rows[j]
            na, nb_ = np.linalg.norm(va), np.linalg.norm(vb)
            if na == 0.0 or nb_ == 0.0:
                continue  # NaN cosine: the kernel's >= threshold drops it
            c = float(np.dot(np.asarray(va) / na, np.asarray(vb) / nb_))
            if c >= thr:
                a, b = min(ia, ib), max(ia, ib)
                want[(a, b)] = float(
                    np.sign(c) * np.floor(abs(c) * 1e6 + 0.5) / 1e6
                )
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6), k


@settings(max_examples=8, deadline=None)
@given(sample=_vecs(4, 2, 5), corpus=_vecs(4, 1, 8))
def test_ivf_cell_assignment_matches_independent_argmax(spark, sample, corpus):
    """The zero-exchange IVF cell assignment (_assign_cells_narrow over the
    broadcast pivot array, BOTH the fold and dim-unrolled score forms) vs
    an independent Python argmax-cosine with the same round-6 tie-break —
    random pivots and corpus, not the fixture's trained centroids."""
    from etl_pipeline_spark.operators.similarity import (
        _assign_cells_narrow,
        _pivot_array,
        _pivot_rows,
        _py_dot,
        _round6,
    )

    ncells = 3
    pivots = _pivot_rows(sample, ncells)
    rows = [(i, v) for i, v in enumerate(corpus)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    piv1 = _pivot_array(spark, pivots)
    got_fold = {
        r.qid: r.cell
        for r in _assign_cells_narrow(df, piv1, "vec_id", "embedding", "qid", False).collect()
    }
    got_unrolled = {
        r.qid: r.cell
        for r in _assign_cells_narrow(
            df, piv1, "vec_id", "embedding", "qid", False, dim=4
        ).collect()
    }
    assert got_fold == got_unrolled

    import math

    want = {}
    for i, v in rows:
        nrm = math.sqrt(_py_dot(v, v))
        best = min(
            (-_round6(_py_dot(v, pe) / (nrm * pn)), cell) for cell, pe, pn in pivots
        )
        want[i] = best[1]
    assert got_fold == want
