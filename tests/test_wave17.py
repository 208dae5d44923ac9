"""Semantic invariants for wave-17 (log-rank test, vocabulary coverage,
HITS) — pure-Python / numpy recomputations independent of the DuckDB
parity gate."""

from __future__ import annotations

from collections import Counter

import duckdb
import numpy as np
import pytest

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

SF_TINY = "/root/testdata/sf0.001"
_DAY_NS = 86_400_000_000_000


# ---------------------------------------------------------------------------
# Log-rank: recompute O-E and V from the raw (duration, censored, group)
# table the textbook way, time point by time point.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("sf_dir", [SF_TINY, SF_DIR])
def test_logrank_matches_textbook(spark, sf_dir):
    rows = duckdb.sql(
        f"""SELECT user_id % 2,
                   (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts))) // {_DAY_NS},
                   CAST((SELECT MAX(epoch_ns(ts))
                         FROM '{sf_dir}/events.parquet')
                        - MAX(epoch_ns(ts)) < 3 * {_DAY_NS} AS INT)
            FROM '{sf_dir}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    times = sorted({t for _, t, _ in rows})
    o_minus_e = v = 0.0
    o1 = o2 = 0
    for t in times:
        n1 = sum(1 for g, d, _ in rows if g == 0 and d >= t)
        n2 = sum(1 for g, d, _ in rows if g == 1 and d >= t)
        d1 = sum(1 for g, d, c in rows if g == 0 and d == t and c == 0)
        d2 = sum(1 for g, d, c in rows if g == 1 and d == t and c == 0)
        nt, dt = n1 + n2, d1 + d2
        o1 += d1
        o2 += d2
        o_minus_e += d1 - dt * n1 / nt
        if nt > 1:
            v += dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1)
    r = REGISTRY["logrank_test_retention"].spark_fn(spark, sf_dir).collect()[0]
    assert (r.churns_a, r.churns_b) == (o1, o2)
    assert r.o_minus_e == pytest.approx(o_minus_e, abs=2e-6)
    assert r.variance == pytest.approx(v, abs=2e-6)
    if v > 0:
        assert r.chi2 == pytest.approx(o_minus_e**2 / v, abs=2e-5)
        assert r.reject_05 == int(o_minus_e**2 / v > 3.841)
    else:  # all-censored window: no churn events, no statistic
        assert r.chi2 is None and r.reject_05 == 0


# ---------------------------------------------------------------------------
# Vocabulary coverage: Counter-based recompute of N, V, f1, f2 and the
# published Good-Turing / Chao1 formulas per language.
# ---------------------------------------------------------------------------
def test_vocab_coverage_matches_counter(spark, duck):
    docs = duck.execute("SELECT lang, text FROM documents").fetchall()
    by_lang: dict[str, Counter] = {}
    for lang, text in docs:
        by_lang.setdefault(lang, Counter()).update(text.split(" "))
    got = {
        r.lang: r
        for r in REGISTRY["vocab_coverage_estimates"]
        .spark_fn(spark, SF_DIR)
        .collect()
    }
    assert set(got) == set(by_lang)
    for lang, tc in by_lang.items():
        n = sum(tc.values())
        v = len(tc)
        f1 = sum(1 for c in tc.values() if c == 1)
        f2 = sum(1 for c in tc.values() if c == 2)
        r = got[lang]
        assert (r.n_tokens, r.n_types, r.f1, r.f2) == (n, v, f1, f2)
        assert r.gt_coverage == pytest.approx(1 - f1 / n, abs=2e-6)
        assert r.chao1_richness == pytest.approx(
            v + f1 * (f1 - 1) / (2 * (f2 + 1)), abs=2e-6
        )
        assert r.chao1_richness >= r.n_types  # a richness FLOOR


# ---------------------------------------------------------------------------
# HITS: numpy power iteration with the same K rounds and L2 norms on the
# same bipartite edge set.
# ---------------------------------------------------------------------------
def test_hits_matches_numpy(spark):
    edges = duckdb.sql(
        f"""SELECT DISTINCT o.o_custkey, l.l_suppkey
            FROM '{SF_TINY}/orders.parquet' o
            JOIN '{SF_TINY}/lineitem.parquet' l
              ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    hubs = sorted({h for h, _ in edges})
    auths = sorted({a for _, a in edges})
    hi = {h: i for i, h in enumerate(hubs)}
    ai = {a: i for i, a in enumerate(auths)}
    m = np.zeros((len(hubs), len(auths)))
    for h_, a_ in edges:
        m[hi[h_], ai[a_]] = 1.0
    h = np.ones(len(hubs))
    for _ in range(6):
        a = m.T @ h
        a = a / np.sqrt((a * a).sum())
        h = m @ a
        h = h / np.sqrt((h * h).sum())
    rows = REGISTRY["hits_hub_authority"].spark_fn(spark, SF_TINY).collect()
    got_a = {r.node_id: r.score for r in rows if r.side == "authority"}
    got_h = {r.node_id: r.score for r in rows if r.side == "hub"}
    assert len(got_a) == min(10, len(auths))
    assert len(got_h) == min(10, len(hubs))
    # every reported score matches numpy's at the same node
    for node, score in got_a.items():
        assert score == pytest.approx(a[ai[node]], abs=2e-6)
    for node, score in got_h.items():
        assert score == pytest.approx(h[hi[node]], abs=2e-6)
    # and the top-1 authority is numpy's argmax (rounded-score ties aside)
    best = max(got_a.items(), key=lambda kv: (kv[1], -kv[0]))
    assert a[ai[best[0]]] == pytest.approx(a.max(), abs=2e-6)
    # ranks are 1..k on both sides
    assert sorted(r.rank for r in rows if r.side == "hub") == list(
        range(1, len(got_h) + 1)
    )
