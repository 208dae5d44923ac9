"""Canary for driver-regenerated testdata: the generator has changed
physical schemas between rounds (events.ts shipped as INT64
TIMESTAMP(NANOS) one round and TIMESTAMP(MICROS) the next). This fails
loudly and specifically at round start instead of scattering type errors
through 100+ queries."""

from __future__ import annotations

import pytest

from etl_pipeline_spark.sources.star import EXPECTED_COLUMNS, TABLES, load_table
from tests.conftest import SF_DIR


@pytest.mark.parametrize("table", TABLES)
def test_expected_columns_present(spark, table):
    load_table(spark, SF_DIR, table, validate=True)


def test_events_ts_normalizes_to_epoch_ns(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "bigint"
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    # plausible epoch-nanosecond range (2000-01-01 .. 2100-01-01)
    assert 946_684_800 * 10**9 < lo <= hi < 4_102_444_800 * 10**9


def test_embeddings_shape(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    assert dict(emb.dtypes)["embedding"].startswith("array")
    n = emb.selectExpr("size(embedding)").distinct().collect()
    assert len(n) == 1, f"ragged embedding lengths: {n}"
