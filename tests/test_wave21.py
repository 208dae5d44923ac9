"""Semantic invariants for wave-21 (Theil decomposition, McNemar)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def test_theil_matches_pure_python_and_decomposes(spark):
    rows = duckdb.sql(
        f"""SELECT n.n_name,
                   SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/customer.parquet' c ON c.c_custkey = o.o_custkey
            JOIN '{SF_DIR}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
            GROUP BY o.o_custkey, n.n_name"""
    ).fetchall()
    xs = [(g, cents) for g, cents in rows if cents > 0]
    n = len(xs)
    mu = sum(c for _, c in xs) / n
    total = sum((c / mu) * math.log(c / mu) for _, c in xs) / n
    groups: dict[str, list] = {}
    for g, c in xs:
        groups.setdefault(g, []).append(c)
    t_between = sum(
        (sum(cs) / (mu * n)) * math.log((sum(cs) / len(cs)) / mu)
        for cs in groups.values()
    )
    r = REGISTRY["theil_index_decomposition"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r.n_customers, r.n_groups) == (n, len(groups))
    # the decomposition identity: total == within + between (exactly, by
    # construction in the engine; here vs the direct definition)
    assert r.theil_total == pytest.approx(total, abs=2e-6)
    assert r.theil_between == pytest.approx(t_between, abs=2e-6)
    assert r.theil_within == pytest.approx(total - t_between, abs=2e-6)
    assert r.theil_total >= 0 and r.theil_within >= 0
    assert 0 <= r.between_share <= 1


def test_mcnemar_matches_pure_python(spark):
    rows = duckdb.sql(
        f"""SELECT user_id, event_type, epoch_ns(ts), event_id
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, et, t, eid in rows:
        by_user.setdefault(u, []).append((t, eid, et))
    train: Counter = Counter()
    test = []
    for u, evs in by_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            if u % 2 == 0:
                train[(a, b)] += 1
            else:
                test.append((a, b))
    contexts = {p for p, _ in train}
    big = {
        p: max(
            ((c, nxt) for (pp, nxt), c in train.items() if pp == p),
            key=lambda kv: (kv[0], [-ord(ch) for ch in kv[1]]),
        )[1]
        for p in contexts
    }
    marg_counts: Counter = Counter()
    for (_, nxt), c in train.items():
        marg_counts[nxt] += c
    marginal = max(
        marg_counts.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]])
    )[0]
    b = c = hit_b = hit_m = n_test = 0
    for prev, actual in test:
        if prev not in big:
            continue  # inner-join semantics
        n_test += 1
        pb, pm = big[prev] == actual, marginal == actual
        hit_b += pb
        hit_m += pm
        b += pb and not pm
        c += pm and not pb
    r = (
        REGISTRY["mcnemar_bigram_vs_marginal"].spark_fn(spark, SF_DIR).collect()[0]
    )
    assert r.n_test == n_test
    assert (r.bigram_only_right, r.marginal_only_right) == (b, c)
    assert r.acc_bigram == pytest.approx(hit_b / n_test, abs=2e-6)
    assert r.acc_marginal == pytest.approx(hit_m / n_test, abs=2e-6)
    chi2 = (abs(b - c) - 1) ** 2 / (b + c)
    assert r.mcnemar_chi2 == pytest.approx(chi2, abs=2e-6)
    assert r.reject_05 == int(chi2 > 3.841)
