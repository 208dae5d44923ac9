"""Shared fixtures: one SparkSession per test run + a DuckDB oracle harness
that mirrors the driver's correctness gate (row count + schema + order-
insensitive value comparison)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from etl_pipeline_spark.session import get_spark
from etl_pipeline_spark.sources.star import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl-pipeline-spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, stringify cells, sort rows — the same
    order-insensitive value form a driver-style hash would see, so dtype
    artifacts (e.g. DuckDB HUGEINT → float64 '1.0' vs '1') fail loudly."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_oracle_match(spark_df, duck_con, oracle: str, name: str = "query") -> None:
    actual = canonicalize(spark_df.toPandas())
    expected = canonicalize(duck_con.execute(oracle).fetchdf())
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: columns {list(actual.columns)} != oracle {list(expected.columns)}"
    )
    pd.testing.assert_frame_equal(
        actual, expected, check_dtype=False, check_exact=True, obj=name
    )
