"""Semantic invariants for wave-19 (Kendall tau-b, Cramer's V, Jaccard
link prediction) — pure-Python recomputations."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from etl_pipeline_spark.plans.corpus_quality import COSUPPLIER_EDGE_CTES
from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()


def test_kendall_matches_pure_python(spark):
    rows = duckdb.sql(
        f"""SELECT SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END),
                   SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                            ELSE 0 END)
            FROM '{SF_DIR}/events.parquet'
            GROUP BY epoch_ns(ts) // 86400000000000"""
    ).fetchall()
    c = d = tx = ty = 0
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            dv = rows[i][0] - rows[j][0]
            dr = rows[i][1] - rows[j][1]
            if dv * dr > 0:
                c += 1
            elif dv * dr < 0:
                d += 1
            if dv == 0:
                tx += 1
            if dr == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    r = REGISTRY["kendall_tau_daily"].spark_fn(spark, SF_DIR).collect()[0]
    assert (r.n_days, r.concordant, r.discordant) == (n, c, d)
    expected = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert r.tau_b == pytest.approx(expected, abs=2e-6)
    assert -1.0 <= r.tau_b <= 1.0


def test_cramers_v_matches_pure_python(spark):
    got = {
        r.pair: r
        for r in REGISTRY["cramers_v_pairs"].spark_fn(spark, SF_DIR).collect()
    }
    specs = {
        "status_x_priority": ("orders", "o_orderstatus", "o_orderpriority"),
        "returnflag_x_linestatus": ("lineitem", "l_returnflag", "l_linestatus"),
    }
    assert set(got) == set(specs)
    for pair, (table, ca, cb) in specs.items():
        cells = Counter(
            dict(
                (
                    (a, b),
                    n,
                )
                for a, b, n in duckdb.sql(
                    f"""SELECT {ca}, {cb}, COUNT(*)
                        FROM '{SF_DIR}/{table}.parquet' GROUP BY 1, 2"""
                ).fetchall()
            )
        )
        n = sum(cells.values())
        rows = Counter()
        cols = Counter()
        for (a, b), k in cells.items():
            rows[a] += k
            cols[b] += k
        chi2 = sum(
            (k - rows[a] * cols[b] / n) ** 2 / (rows[a] * cols[b] / n)
            for (a, b), k in cells.items()
        )
        r = got[pair]
        assert (r.n, r.r, r.c) == (n, len(rows), len(cols))
        assert r.dof == (len(rows) - 1) * (len(cols) - 1)
        assert r.chi2 == pytest.approx(chi2, abs=2e-4)
        v = math.sqrt(chi2 / (n * min(len(rows) - 1, len(cols) - 1)))
        assert r.cramers_v == pytest.approx(v, abs=2e-6)
        assert 0.0 <= r.cramers_v <= 1.0


def test_jaccard_link_matches_pure_python(spark, duck):
    edges = duck.execute(
        f"WITH {COSUPPLIER_EDGE_CTES} SELECT src, dst FROM edges"
    ).fetchall()
    adj: dict[int, set] = {}
    eset = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        eset.add((s, d))
    scored = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in eset:
                continue
            common = len(adj[a] & adj[b])
            if common:
                scored[(a, b)] = (common, common / len(adj[a] | adj[b]))
    rows = REGISTRY["jaccard_link_prediction"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) == min(50, len(scored))
    top = sorted(
        scored.items(), key=lambda kv: (-round(kv[1][1], 6), kv[0])
    )[: len(rows)]
    for r, ((a, b), (common, j)) in zip(
        sorted(rows, key=lambda r: (-r.jaccard, r.node_a, r.node_b)), top
    ):
        assert (r.node_a, r.node_b, r.n_common) == (a, b, common)
        assert r.jaccard == pytest.approx(j, abs=2e-6)
