"""Round-7 regression tests for the advisor findings:

1. ``cosine_pairs`` must survive sparse / non-contiguous vec_ids (the
   advertised in-bucket-verifier usage) where an (ba, bb) block pair can
   hold rows from only one side — previously np.vstack on the empty side
   raised ValueError.
2. ``cosine_pairs`` rounds HALF_UP (away from zero), matching Spark
   F.round / DuckDB ROUND, not numpy's half-to-even.
3. ``markov_attribution_removal`` with zero purchase mass returns the
   empty result (mirroring the oracle's empty b2/eff CTEs) instead of
   raising ZeroDivisionError.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_pipeline_spark.operators.similarity import cosine_pairs


def _brute_pairs(ids, vecs, threshold):
    m = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    m = m / norms
    c = m @ m.T
    out = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            cv = c[i, j]
            if cv >= threshold:
                r6 = np.sign(cv) * np.floor(abs(cv) * 1e6 + 0.5) / 1e6
                a, b = sorted((ids[i], ids[j]))
                out[(a, b)] = r6
    return out


def test_cosine_pairs_sparse_ids_empty_blocks(spark):
    """Ids all ≡ 3 (mod nb) leave most residue classes empty on one or
    both sides; the kernel must emit the same pairs as brute force, not
    crash."""
    rng = np.random.default_rng(7)
    # 12 vectors with ids 3, 103, 203, ... — with block_rows=4 → nb=3,
    # every id lands in residue class 3 % ... non-uniform; many (ba,bb)
    # groups see only one side.
    ids = [3 + 100 * i for i in range(12)]
    vecs = rng.normal(size=(12, 8)).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in cosine_pairs(df, threshold=0.0, block_rows=4).collect()
    }
    want = _brute_pairs(ids, vecs, 0.0)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_cosine_pairs_single_id_per_block(spark):
    """Degenerate: fewer vectors than blocks — most groups entirely
    one-sided or empty; must not raise."""
    df = spark.createDataFrame(
        [(5, [1.0, 0.0]), (7, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    rows = cosine_pairs(df, threshold=0.0, block_rows=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.vec_a, r.vec_b) == (5, 7)
    assert r.cosine == pytest.approx(round(1 / np.sqrt(2), 6), abs=1e-12)


def test_markov_zero_purchase_mass_returns_empty(spark, tmp_path):
    """Events with no 'purchase' rows → base conversion 0 → oracle's
    b2/eff CTEs are empty; the driver-side solve must return empty, not
    divide by zero."""
    from etl_pipeline_spark.plans.advanced_analytics import (
        markov_attribution_removal,
    )

    sf = str(tmp_path / "sf_nopurchase")
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "view", 1.0, "{}"),
            (2, "2024-01-01 00:01:00", 10, "click", 1.0, "{}"),
            (3, "2024-01-01 00:02:00", 11, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    )
    ev.write.parquet(f"{sf}/events.parquet")
    out = markov_attribution_removal(spark, sf)
    assert out.count() == 0
    assert out.columns == ["channel", "removal_effect", "attribution_share"]


def test_round6_half_up_matches_duckdb_round():
    """Pin the convention: utils/rounding.round6_half_up must agree with
    DuckDB's ROUND(x, 6) (the oracle side of every driver-side solve)
    on random doubles AND exact 6-dp midpoints — Python round()/np.round
    fail the midpoint cases (half-to-even)."""
    import random

    import duckdb

    from etl_pipeline_spark.utils.rounding import round6_half_up

    con = duckdb.connect()
    random.seed(7)
    vals = (
        [random.uniform(-1000, 1000) for _ in range(2000)]
        + [i / 2e6 for i in range(-50, 50)]  # exact 6-dp midpoints
        + [2.0000005, -2.0000005, 0.0000005, 1.0000015]
    )
    for x in vals:
        want = con.execute("SELECT ROUND(?::DOUBLE, 6)", [x]).fetchone()[0]
        assert round6_half_up(x) == want, x
    con.close()


def test_similarity_round6_matches_spark_fround(spark):
    """Pin the OTHER convention helper: operators/similarity._round6
    (Decimal shortest-repr HALF_UP — the Java BigDecimal.valueOf path)
    must agree with Spark's F.round(col, 6) on random doubles and
    repr-level midpoints, since IVF/PQ probe lists computed on the
    driver are compared against F.round-ed engine columns."""
    import random

    from pyspark.sql import functions as F

    from etl_pipeline_spark.operators.similarity import _round6

    random.seed(11)
    vals = (
        [random.uniform(-1.0, 1.0) for _ in range(500)]
        + [2.0000005, -2.0000005, 0.0000005, 1.0000015, 0.1234565]
    )
    df = spark.createDataFrame([(v,) for v in vals], "x double").select(
        "x", F.round("x", 6).alias("r")
    )
    for row in df.collect():
        assert _round6(row.x) == row.r, row.x
