"""Semantic invariants for wave-20 (Gumbel block maxima, capture-
recapture, NB overdispersion, entropy rate) — pure-Python recomputes."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

_DAY_NS = 86_400_000_000_000


def test_gumbel_matches_pure_python(spark):
    daily = duckdb.sql(
        f"""SELECT epoch_ns(ts) // {_DAY_NS} AS day,
                   SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
            FROM '{SF_DIR}/events.parquet'
            WHERE event_type = 'purchase' GROUP BY 1"""
    ).fetchall()
    blocks: dict[int, int] = {}
    for day, cents in daily:
        wk = day // 7
        blocks[wk] = max(blocks.get(wk, 0), cents)
    xs = [c / 100.0 for c in blocks.values()]
    n = len(xs)
    xbar = sum(xs) / n
    var = (sum(x * x for x in xs) / n - xbar * xbar) * n / (n - 1)
    beta = math.sqrt(var) * math.sqrt(6) / math.pi
    mu = xbar - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1 - 1 / 4.0))
    r = REGISTRY["gumbel_weekly_max_revenue"].spark_fn(spark, SF_DIR).collect()[0]
    assert r.n_blocks == n
    assert r.block_max_mean == pytest.approx(xbar, abs=2e-6)
    assert r.gumbel_beta == pytest.approx(beta, abs=2e-5)
    assert r.gumbel_mu == pytest.approx(mu, abs=2e-5)
    assert r.return_level_4 == pytest.approx(rl, abs=2e-5)
    assert r.return_level_4 > r.gumbel_mu  # T > e/(e-1) exceedance level


def test_capture_recapture_matches_pure_python(spark):
    rows = duckdb.sql(
        f"SELECT user_id, epoch_ns(ts) FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    ts = [t for _, t in rows]
    mid = (min(ts) + max(ts)) // 2
    first = {u for u, t in rows if t < mid}
    second = {u for u, t in rows if t >= mid}
    n1, n2, m = len(first), len(second), len(first & second)
    r = REGISTRY["capture_recapture_users"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r.n1, r.n2, r.m) == (n1, n2, m)
    assert r.n_true == len(first | second)
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert r.n_chapman == pytest.approx(nhat, abs=2e-6)
    # the estimator never undershoots the recaptured overlap
    assert r.n_chapman >= m


def test_nb_overdispersion_matches_pure_python(spark):
    counts = Counter()
    for (u, et) in duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF_DIR}/events.parquet'"
    ).fetchall():
        counts[u] += 1 if et == "purchase" else 0
    ks = list(counts.values())
    n = len(ks)
    mean = sum(ks) / n
    var = (sum(k * k for k in ks) / n - mean * mean) * n / (n - 1)
    r = (
        REGISTRY["nb_overdispersion_purchases"].spark_fn(spark, SF_DIR).collect()[0]
    )
    assert r.n_users == n
    assert r.mean_purchases == pytest.approx(mean, abs=2e-6)
    assert r.var_purchases == pytest.approx(var, abs=2e-6)
    assert r.dispersion_index == pytest.approx(var / mean, abs=2e-6)
    if var > mean:
        assert r.nb_r == pytest.approx(mean * mean / (var - mean), abs=2e-5)
        assert r.nb_p == pytest.approx(mean / var, abs=2e-6)
    else:  # under-dispersed: NB fit undefined
        assert r.nb_r is None and r.nb_p is None


def test_entropy_rate_matches_pure_python(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_ns(ts), event_id
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, et, t, eid in rows:
        by_user.setdefault(u, []).append((t, eid, et))
    trans = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    nt = sum(trans.values())
    src_tot = Counter()
    for (a, _), c in trans.items():
        src_tot[a] += c
    h = -sum(
        (src_tot[a] / nt) * (c / src_tot[a]) * math.log(c / src_tot[a])
        for (a, _), c in trans.items()
    )
    h0 = -sum((c / nt) * math.log(c / nt) for c in src_tot.values())
    r = REGISTRY["entropy_rate_transitions"].spark_fn(spark, SF_DIR).collect()[0]
    assert r.entropy_rate == pytest.approx(h, abs=2e-6)
    assert r.entropy_zeroth == pytest.approx(h0, abs=2e-6)
    assert r.info_gain == pytest.approx(h0 - h, abs=2e-6)
    # conditioning can only reduce entropy
    assert r.entropy_rate <= r.entropy_zeroth + 1e-9
