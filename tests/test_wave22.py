"""Semantic invariants for wave-22 (runs test, Allen interval profile)."""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import SF_DIR

_ensure_loaded()

_DAY_NS = 86_400_000_000_000


def test_runs_test_matches_pure_python(spark):
    daily = sorted(
        duckdb.sql(
            f"""SELECT epoch_ns(ts) // {_DAY_NS},
                       SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                FROM '{SF_DIR}/events.parquet'
                WHERE event_type = 'purchase' GROUP BY 1"""
        ).fetchall()
    )
    vals = [c for _, c in daily]
    med = sorted(
        (c, d) for d, c in daily
    )[(len(vals) + 1) // 2 - 1][0]  # lower median, day tie-break
    signs = [(d, c > med) for d, c in daily if c != med]
    n1 = sum(1 for _, a in signs if a)
    n2 = len(signs) - n1
    r = 1 + sum(
        1 for (_, a), (_, b) in zip(signs, signs[1:]) if a != b
    )
    row = REGISTRY["runs_test_daily_revenue"].spark_fn(spark, SF_DIR).collect()[0]
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, r)
    er = 1 + 2 * n1 * n2 / (n1 + n2)
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert row.expected_runs == pytest.approx(er, abs=2e-6)
    assert row.z == pytest.approx((r - er) / math.sqrt(var), abs=2e-6)
    assert row.reject_05 == int(abs((r - er) / math.sqrt(var)) > 1.96)


def _allen(a_s, a_e, b_s, b_e):
    if a_s == b_s and a_e == b_e:
        return "equal"
    if a_e < b_s:
        return "before"
    if a_e == b_s:
        return "meets"
    if a_s == b_s and a_e < b_e:
        return "starts"
    if a_s == b_s:
        return "started_by"
    if a_e == b_e and a_s < b_s:
        return "finished_by"
    if a_e == b_e:
        return "finishes"
    if a_s < b_s and a_e > b_e:
        return "contains"
    if a_s > b_s and a_e < b_e:
        return "during"
    if a_s < b_s and b_s < a_e < b_e:
        return "overlaps"
    if b_s < a_s < b_e and a_e > b_e:
        return "overlapped_by"
    if a_s >= b_e:
        return "after"
    return "other"


def test_allen_profile_matches_pure_python(spark):
    ivs = duckdb.sql(
        f"""SELECT o.o_custkey,
                   date_diff('day', TIMESTAMP '1970-01-01 00:00:00',
                             o.o_orderdate),
                   MAX(date_diff('day', TIMESTAMP '1970-01-01 00:00:00',
                                 l.l_shipdate)),
                   o.o_orderkey
            FROM '{SF_DIR}/orders.parquet' o
            JOIN '{SF_DIR}/lineitem.parquet' l
              ON l.l_orderkey = o.o_orderkey
            GROUP BY 1, 2, 4"""
    ).fetchall()
    by_cust: dict[int, list] = {}
    for ck, s, e, ok in ivs:
        by_cust.setdefault(ck, []).append((s, ok, e))
    want: dict[str, int] = {}
    for seq in by_cust.values():
        seq.sort()
        for (a_s, _, a_e), (b_s, _, b_e) in zip(seq, seq[1:]):
            rel = _allen(a_s, a_e, b_s, b_e)
            want[rel] = want.get(rel, 0) + 1
    got = {
        r.relation: r.n_pairs
        for r in REGISTRY["allen_interval_profile"].spark_fn(spark, SF_DIR).collect()
    }
    assert got == want
    assert "other" not in got  # the 13 relations are exhaustive
    assert sum(got.values()) == sum(
        len(v) - 1 for v in by_cust.values() if len(v) > 0
    )
