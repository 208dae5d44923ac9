"""Structured Streaming surface: availableNow drain over the events parquet
must equal the DuckDB-oracle-checked batch plans (the semantics contract)."""

from __future__ import annotations

from etl_pipeline_spark.plans.streaming_batch import events_tumbling_1h
from etl_pipeline_spark.streaming.windows import (
    events_stream,
    run_available_now,
    sessionized,
    tumbling_counts,
)
from tests.conftest import SF_DIR, canonicalize


def test_tumbling_stream_equals_batch(spark):
    stream = events_stream(spark, SF_DIR)
    assert stream.isStreaming
    got = run_available_now(tumbling_counts(stream), "tumbling_test").toPandas()
    want = events_tumbling_1h(spark, SF_DIR).toPandas()
    assert canonicalize(got).equals(canonicalize(want))


def test_session_stream_shape(spark):
    stream = events_stream(spark, SF_DIR)
    got = run_available_now(sessionized(stream), "session_test")
    assert got.count() > 0
    assert set(got.columns) == {"user_id", "session_start_epoch", "n_events", "total_value"}
