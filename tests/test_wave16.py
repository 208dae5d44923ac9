"""Semantic invariants for the wave-16 queries (Croston forecast, hub
BFS, BH-FDR, DP exponential mechanism) — third-party recomputations in
pure Python / numpy, independent of the DuckDB oracle parity gate."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from etl_pipeline_spark.plans.corpus_quality import COSUPPLIER_EDGE_CTES
from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

SF_TINY = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Croston: the unrolled weighted sum must equal the textbook RECURSION
# S_n = a*x_n + (1-a)*S_(n-1), S_1 = x_1, run in pure Python.
# ---------------------------------------------------------------------------
def _ewma_half(xs):
    s = float(xs[0])
    for x in xs[1:]:
        s = 0.5 * x + 0.5 * s
    return s


def test_croston_matches_recursive_ewma(spark):
    rows = duckdb.sql(
        f"""SELECT l_partkey, year(l_shipdate) * 12 + month(l_shipdate) - 1
                       AS m,
                   SUM(CAST(l_quantity AS BIGINT)) AS q
            FROM '{SF_TINY}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    m0 = min(m for _, m, _ in rows)
    by_part: dict[int, list] = {}
    for pk, m, q in rows:
        by_part.setdefault(pk, []).append((m, q))
    got = {
        r.l_partkey: r
        for r in REGISTRY["croston_demand_forecast"]
        .spark_fn(spark, SF_TINY)
        .collect()
    }
    expected_parts = {pk for pk, v in by_part.items() if len(v) >= 2}
    assert set(got) == expected_parts
    for pk in expected_parts:
        seq = by_part[pk]
        zs = [q for _, q in seq]
        gaps = [seq[0][0] - m0 + 1] + [
            b[0] - a[0] for a, b in zip(seq, seq[1:])
        ]
        r = got[pk]
        assert r.n_epochs == len(seq)
        assert r.size_ewma == pytest.approx(_ewma_half(zs), abs=2e-6)
        assert r.interval_ewma == pytest.approx(_ewma_half(gaps), abs=2e-6)
        assert r.croston_forecast == pytest.approx(
            _ewma_half(zs) / _ewma_half(gaps), abs=2e-6
        )


# ---------------------------------------------------------------------------
# BFS: hop distribution equals a pure-Python BFS over the same edge
# relation (extracted via the shared CTE SQL so the graphs can't drift).
# ---------------------------------------------------------------------------
def test_bfs_matches_pure_python(spark, duck):
    edges = duck.execute(
        f"WITH {COSUPPLIER_EDGE_CTES} SELECT src, dst FROM edges"
    ).fetchall()
    adj: dict[int, set] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    deg_hub = max(adj, key=lambda n: (len(adj[n]), -n))
    hops = {deg_hub: 0}
    frontier = [deg_hub]
    for h in range(1, 7):
        nxt = []
        for n in frontier:
            for p in adj[n]:
                if p not in hops:
                    hops[p] = h
                    nxt.append(p)
        frontier = nxt
    dist: dict[int, int] = {}
    for h in hops.values():
        dist[h] = dist.get(h, 0) + 1
    dist[-1] = len(adj) - len(hops)
    got = {
        r.hop: r.n_nodes
        for r in REGISTRY["bfs_hops_from_hub"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == dist
    assert got[0] == 1  # exactly one hub


# ---------------------------------------------------------------------------
# BH-FDR: the A&S p approximates the exact normal two-sided p within its
# published 7.5e-8 bound; the step-up rejection set recomputed from the
# reported p-values must equal the engine's flags (and be a prefix of
# the rank order).
# ---------------------------------------------------------------------------
def test_bh_fdr_procedure_and_p_accuracy(spark):
    rows = sorted(
        REGISTRY["bh_fdr_nation_conversion"].spark_fn(spark, SF_DIR).collect(),
        key=lambda r: r.bh_rank,
    )
    m = len(rows)
    assert [r.bh_rank for r in rows] == list(range(1, m + 1))
    ps = [r.p_value for r in rows]
    assert ps == sorted(ps)  # rank follows p ascending
    for r in rows:
        exact = 2.0 * 0.5 * math.erfc(abs(r.z) / math.sqrt(2.0))
        assert r.p_value == pytest.approx(exact, abs=2e-6)
    # step-up: reject 1..k where k = max { i : p_i <= q*i/m }
    k = max((i + 1 for i in range(m) if ps[i] <= 0.10 * (i + 1) / m), default=0)
    expected = [1 if r.bh_rank <= k else 0 for r in rows]
    assert [r.bh_reject for r in rows] == expected
    # rejections form a prefix of the rank order
    flags = [r.bh_reject for r in rows]
    assert flags == sorted(flags, reverse=True)


# ---------------------------------------------------------------------------
# DP exponential mechanism: score recomputed from the md5 uniform in
# pure Python; selection = top-k by (rounded score, type).
# ---------------------------------------------------------------------------
def _hash_u32(seed: str, key: str) -> int:
    return int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16)


def test_dp_exponential_scores_and_selection(spark, duck):
    counts = dict(
        duck.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    rows = (
        REGISTRY["dp_exponential_topk"].spark_fn(spark, SF_DIR).collect()
    )
    assert {r.event_type for r in rows} == set(counts)
    exp_scores = {}
    for t, n in counts.items():
        u = (_hash_u32("dpexp", t) + 0.5) / 2**32
        exp_scores[t] = n * 0.1 / 2.0 + (-math.log(-math.log(u)))
    order = sorted(rows, key=lambda r: r.rank)
    assert [r.event_type for r in order] == [
        t
        for t, _ in sorted(
            exp_scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )
    ]
    for r in rows:
        assert r.n_true == counts[r.event_type]
        assert r.score == pytest.approx(exp_scores[r.event_type], abs=2e-6)
        assert r.selected == (1 if r.rank <= 3 else 0)
