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


def test_stream_to_table_append(spark, tmp_path):
    from etl_pipeline_spark.streaming.windows import stream_to_table

    spark.sql("CREATE DATABASE IF NOT EXISTS stream_sink_db")
    try:
        src = tmp_path / "src"
        for i in range(2):
            spark.createDataFrame(
                [(i * 10 + j, f"v{j}") for j in range(5)], "id bigint, name string"
            ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))
        stream = (
            spark.readStream.schema("id bigint, name string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        stream_to_table(
            stream, "stream_sink_db.loaded", mode="append",
            checkpoint=str(tmp_path / "ckpt"), query_name="s2t_test",
        )
        out = spark.table("stream_sink_db.loaded")
        assert out.count() == 10  # both micro-batches appended through the checked sink
    finally:
        spark.sql("DROP DATABASE IF EXISTS stream_sink_db CASCADE")
