"""Edge-input parity for the round-5 analytics queries: the SAME
Spark-vs-DuckDB hash comparison the driver runs, but on tiny synthetic
tables crafted to hit the branches sf-data never exercises — the KM
zero-survival factor, an ACF series shorter than the max lag, and a
single-customer Gini."""

from __future__ import annotations

import duckdb
import pytest

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from tests.conftest import assert_oracle_match

_ensure_loaded()

_DAY_NS = 86_400_000_000_000


def _duck_for(tmpdir, tables):
    con = duckdb.connect()
    for t in tables:
        # Spark writes <name>.parquet as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{tmpdir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.fixture()
def edge_events(spark, tmp_path):
    """User 1 churns at duration 10 days (the LAST at-risk row with no
    censoring → d == n_at_risk → the survival-0 branch); user 2 anchors
    the window edge (active in the final 3 days → censored, duration 0)."""
    rows = [
        (1, 0 * _DAY_NS, 1, "view", 1.0, "{}"),
        (2, 10 * _DAY_NS, 1, "view", 1.0, "{}"),
        (3, 40 * _DAY_NS, 2, "view", 1.0, "{}"),
    ]
    schema = (
        "event_id bigint, ts bigint, user_id bigint,"
        " event_type string, value double, props string"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_kaplan_meier_zero_survival_branch_parity(spark, edge_events):
    """Everyone at risk at the max duration churns: km_survival must be
    exactly 0.0 in BOTH engines (Spark LN(0) is NULL, DuckDB -inf — the
    cumulative dead-flag guard is what keeps them identical)."""
    spec = REGISTRY["kaplan_meier_retention"]
    df = spec.spark_fn(spark, edge_events)
    con = _duck_for(edge_events, ["events"])
    # duckdb epoch_ns() needs a timestamp column; the synthetic table
    # ships ts as raw ns, so adapt the oracle's accessor
    oracle = spec.oracle.replace("epoch_ns(ts)", "ts")
    assert_oracle_match(df, con, oracle, "kaplan_meier_edge")
    rows = {r.duration_days: r for r in df.collect()}
    assert rows[10].km_survival == 0.0  # the zero-factor branch fired
    assert rows[0].n_censored == 1


@pytest.fixture()
def edge_orders(spark, tmp_path):
    """Three order days (shorter than the 7-lag ACF horizon) and a
    single customer (Gini == 0 by definition)."""
    rows = [
        (1, 7, "O", 100.0, "1995-01-01", "1-URGENT"),
        (2, 7, "O", 300.0, "1995-01-02", "1-URGENT"),
        (3, 7, "O", 200.0, "1995-01-03", "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP_NTZ) AS o_orderdate",
        "o_orderpriority",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_acf_series_shorter_than_max_lag_parity(spark, edge_orders):
    """With 3 days, lags 3..7 have zero pairs: both engines must emit
    ONLY lags 1-2 (no null-acf rows, no division by empty sums)."""
    spec = REGISTRY["acf_daily_revenue"]
    df = spec.spark_fn(spark, edge_orders)
    con = _duck_for(edge_orders, ["orders"])
    assert_oracle_match(df, con, spec.oracle, "acf_edge")
    lags = {r.lag: r.n_pairs for r in df.collect()}
    assert lags == {1: 2, 2: 1}


def test_gini_single_customer_parity(spark, edge_orders):
    """One customer owns all revenue: G = 2·1·x/(1·x) − 2/1 = 0 — the
    degenerate-but-defined case."""
    spec = REGISTRY["gini_revenue_concentration"]
    df = spec.spark_fn(spark, edge_orders)
    con = _duck_for(edge_orders, ["orders"])
    assert_oracle_match(df, con, spec.oracle, "gini_edge")
    row = df.collect()[0]
    assert row.n_customers == 1 and row.gini == 0.0
