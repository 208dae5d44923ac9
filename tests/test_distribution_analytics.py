"""Semantic invariants for the wave-15 distribution/calibration/spatial
queries — third-party recomputations (numpy / pure Python) and crafted
edge cases, independent of the DuckDB oracle the parity gate uses."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from etl_pipeline_spark.operators.spatial import grid_nearest_join
from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

SF_TINY = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# grid_nearest_join: crafted cases exercising every branch of the
# exactness guard, checked against brute force.
# ---------------------------------------------------------------------------
def _brute(points, pois):
    out = {}
    for pid, x, y in points:
        best = min(
            ((x - px) ** 2 + (y - py) ** 2, qid) for qid, px, py in pois
        )
        out[pid] = (best[1], best[0])
    return out


def test_grid_nearest_join_guard_and_fallback(spark):
    # cell_size=10. p1: ring-1 candidate exists but FAILS the guard
    # (d=19 > 10) and the true NN sits OUTSIDE ring-1 — the case a naive
    # ring-1 join silently gets wrong. p2: guard passes in ring-1.
    # p3: empty ring-1 neighborhood. p6: exact tie -> smaller poi_id.
    points = [(1, 30, 5), (2, 48, 5), (3, 5, 95), (6, 15, 5)]
    pois = [(1, 49, 5), (2, 12, 5), (3, 18, 5)]
    pts_df = spark.createDataFrame(points, "pt_id long, x long, y long")
    poi_df = spark.createDataFrame(pois, "poi_id long, px long, py long")
    got = {
        r.pt_id: (r.poi_id, r.dist2)
        for r in grid_nearest_join(pts_df, poi_df, cell_size=10).collect()
    }
    assert got == _brute(points, pois)
    # the tie case: d2=9 to both poi 2 (at 12,5) and poi 3 (at 18,5)
    assert got[6] == (2, 9)


def test_grid_nearest_poi_matches_brute_force_tiny(spark):
    q = REGISTRY["grid_nearest_poi"]
    got = {r.pt_id: (r.poi_id, r.dist2) for r in q.spark_fn(spark, SF_TINY).collect()}
    pts = duckdb.sql(
        f"""SELECT o_orderkey, (o_custkey * 7919 + o_orderkey) % 10000,
                   (o_orderkey * 104729) % 10000
            FROM '{SF_TINY}/orders.parquet'"""
    ).fetchall()
    pois = duckdb.sql(
        f"""SELECT s_suppkey, (s_suppkey * 3571) % 10000,
                   (s_suppkey * 9973) % 10000
            FROM '{SF_TINY}/supplier.parquet'"""
    ).fetchall()
    assert got == _brute(pts, pois)


# ---------------------------------------------------------------------------
# Cross-correlation: every lag equals numpy's Pearson r on the shifted
# daily count series.
# ---------------------------------------------------------------------------
def test_crosscorr_matches_numpy(spark):
    day_ns = 86_400_000_000_000
    rows = duckdb.sql(
        f"""SELECT epoch_ns(ts) // {day_ns} AS day,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            FROM '{SF_TINY}/events.parquet' GROUP BY 1"""
    ).fetchall()
    v = {d: a for d, a, _ in rows}
    p = {d: b for d, _, b in rows}
    got = {
        r.lag: (r.n_days, r.ccf)
        for r in REGISTRY["crosscorr_daily_lags"].spark_fn(spark, SF_TINY).collect()
    }
    for lag in range(8):
        days = [d for d in v if d + lag in p]
        x = np.array([v[d] for d in days], dtype=float)
        y = np.array([p[d + lag] for d in days], dtype=float)
        n_days, ccf = got[lag]
        assert n_days == len(days)
        if x.std() == 0 or y.std() == 0:
            assert ccf is None
        else:
            assert ccf == pytest.approx(float(np.corrcoef(x, y)[0, 1]), abs=2e-6)


# ---------------------------------------------------------------------------
# Wasserstein-1: matches the numpy integral of |CDF_A - CDF_B| over the
# exact cents grid.
# ---------------------------------------------------------------------------
def test_wasserstein_matches_numpy(spark):
    va, vb = (
        np.array(
            duckdb.sql(
                f"""SELECT CAST(ROUND(value * 100, 0) AS BIGINT)
                    FROM '{SF_TINY}/events.parquet'
                    WHERE event_type = '{t}'"""
            ).fetchall(),
            dtype=np.int64,
        ).ravel()
        for t in ("view", "purchase")
    )
    grid = np.unique(np.concatenate([va, vb]))
    cdf_a = np.searchsorted(np.sort(va), grid, side="right") / len(va)
    cdf_b = np.searchsorted(np.sort(vb), grid, side="right") / len(vb)
    w1 = float(np.sum(np.abs(cdf_a[:-1] - cdf_b[:-1]) * np.diff(grid)) / 100.0)
    row = REGISTRY["wasserstein_value_drift"].spark_fn(spark, SF_TINY).collect()[0]
    assert row.n_view == len(va) and row.n_purchase == len(vb)
    assert row.w1_distance == pytest.approx(w1, abs=2e-6)


# ---------------------------------------------------------------------------
# Heaps growth: prefix curves are nondecreasing and the last prefix is
# the full corpus (totals re-derived in DuckDB).
# ---------------------------------------------------------------------------
def test_heaps_monotone_and_final_point(spark, duck):
    rows = sorted(
        REGISTRY["heaps_vocab_growth"].spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert a.n_tokens <= b.n_tokens and a.vocab <= b.vocab
        assert a.heaps_beta == b.heaps_beta  # one slope, repeated
    total_tok = duck.execute(
        "SELECT SUM(len(string_split(text, ' '))) FROM documents"
    ).fetchone()[0]
    total_vocab = duck.execute(
        """SELECT COUNT(DISTINCT term) FROM (
               SELECT unnest(string_split(text, ' ')) AS term
               FROM documents)"""
    ).fetchone()[0]
    assert rows[-1].n_tokens == total_tok and rows[-1].vocab == total_vocab
    # beta == the numpy ln-ln OLS slope on the same 10 points (the
    # synthetic corpus has a tiny fixed vocab, so beta may round to 0)
    lx = np.round(np.log([r.n_tokens for r in rows]), 6)
    ly = np.round(np.log([r.vocab for r in rows]), 6)
    beta = float(np.polyfit(lx, ly, 1)[0])
    assert rows[-1].heaps_beta == pytest.approx(beta, abs=2e-6)
    assert 0.0 <= rows[-1].heaps_beta < 1.0  # sublinear growth


# ---------------------------------------------------------------------------
# Brier: the collapsed integer-sum formula matches an explicit pure-Python
# sum_k (p_k - y_k)^2 per transition.
# ---------------------------------------------------------------------------
def test_brier_matches_pure_python(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_ns(ts), event_id
            FROM '{SF_TINY}/events.parquet'"""
    ).fetchall()
    types = sorted({r[1] for r in rows})
    k = len(types)
    by_user: dict[int, list] = {}
    for uid, et, t, eid in rows:
        by_user.setdefault(uid, []).append((t, eid, et))
    train: dict[tuple, int] = {}
    test: list[tuple] = []
    for uid, evs in by_user.items():
        evs.sort()
        for (_, _, prev), (_, _, cur) in zip(evs, evs[1:]):
            if uid % 2 == 0:
                train[(prev, cur)] = train.get((prev, cur), 0) + 1
            else:
                test.append((prev, cur))
    tot = {p: sum(c for (pp, _), c in train.items() if pp == p) for p in types}
    acc: dict[str, list] = {}
    for prev, actual in test:
        if tot.get(prev, 0) == 0:
            continue  # inner-join semantics: contexts unseen in train drop
        t_denom = tot[prev] + k
        b = sum(
            ((train.get((prev, nt), 0) + 1) / t_denom - (1.0 if nt == actual else 0.0))
            ** 2
            for nt in types
        )
        acc.setdefault(prev, []).append(b)
    expected = {p: sum(v) / len(v) for p, v in acc.items()}
    got = {
        r.prev_type: (r.n_test, r.brier)
        for r in REGISTRY["brier_next_event_model"].spark_fn(spark, SF_TINY).collect()
    }
    assert set(got) == set(expected)
    for p, (n_test, brier) in got.items():
        assert n_test == len(acc[p])
        assert brier == pytest.approx(expected[p], abs=2e-6)
        assert 0.0 <= brier <= 2.0  # Brier's range


# ---------------------------------------------------------------------------
# Blocking quality: the case-folded name rule guarantees every injected
# variant pair survives blocking -> completeness is exactly 1; candidate
# pruning must still be strong.
# ---------------------------------------------------------------------------
def test_blocking_quality_bounds(spark):
    row = REGISTRY["blocking_quality_er"].spark_fn(spark, SF_DIR).collect()[0]
    assert row.pairs_completeness == 1.0
    assert row.n_found == row.n_truth
    assert 0.9 < row.reduction_ratio < 1.0
    assert row.n_candidates >= row.n_truth
    assert math.isclose(
        row.reduction_ratio,
        1.0 - row.n_candidates * 2.0 / (row.n_records * (row.n_records - 1)),
        abs_tol=1e-6,
    )
