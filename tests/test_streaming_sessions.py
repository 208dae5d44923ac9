"""Stateful streaming sessionization: cross-batch session continuation,
closed-session emission, and equality with the batch sessionize twin on
the real events table (closed sessions = batch sessions minus each key's
final, still-open one)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from etl_pipeline_spark.plans.streaming_batch import events_sessionize_30m
from etl_pipeline_spark.sources.star import load_table
from etl_pipeline_spark.streaming.sessions import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"
_GAP_NS = 30 * 60 * 1_000_000_000


def _run_stream(spark, src_glob, name, gap):
    stream = (
        spark.readStream.schema("user_id bigint, ts bigint, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_glob)
    )
    out = sessionize_stream(stream, "user_id", "ts", "value", gap=gap)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_sessions_span_micro_batches(spark, tmp_path):
    src = tmp_path / "sess_src"
    src.mkdir()
    # user 1: runs (0,10) gap (100,105) gap (2000 open); session (100,105)
    # spans the two files. user 2: single open session.
    f0 = [(1, 0, 1.0), (1, 10, 2.0), (1, 100, 3.0), (2, 5, 9.0)]
    f1 = [(1, 105, 4.0), (1, 2000, 5.0)]
    for i, rows in enumerate([f0, f1]):
        spark.createDataFrame(rows, "user_id bigint, ts bigint, value double") \
            .coalesce(1).write.parquet(str(src / f"f{i}"))
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    got = {
        (r.key, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in _run_stream(spark, str(src / "*"), "sess_span", gap=50).collect()
    }
    # closed sessions only; (2000,...) and user 2 stay open in state
    assert got == {(1, 0, 10, 2, 3.0), (1, 100, 105, 2, 7.0)}


def test_stream_matches_batch_on_events(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")
    # slice into 3 time-ordered files so sessions cross micro-batches
    qs = ev.approxQuantile("ts", [0.33, 0.66], 0.01)
    src = tmp_path / "ev_stream"
    bounds = [(None, qs[0]), (qs[0], qs[1]), (qs[1], None)]
    for i, (lo, hi) in enumerate(bounds):
        part = ev
        if lo is not None:
            part = part.filter(F.col("ts") > lo)
        if hi is not None:
            part = part.filter(F.col("ts") <= hi)
        part.coalesce(1).write.parquet(str(src / f"f{i}"))
        time.sleep(1.1)

    streamed = _run_stream(spark, str(src / "*"), "sess_events", gap=_GAP_NS)
    got = {
        (r.key, r.session_start // 1_000_000_000, r.session_end // 1_000_000_000,
         r.n_events, round(r.total_value, 2))
        for r in streamed.collect()
    }

    batch = events_sessionize_30m(spark, SF_DIR)
    last = batch.groupBy("user_id").agg(F.max("session_nr").alias("last_nr"))
    closed = batch.join(
        last,
        (batch.user_id == last.user_id) & (batch.session_nr == last.last_nr),
        "left_anti",
    )
    want = {
        (r.user_id, r.session_start_epoch, r.session_end_epoch,
         r.n_events, round(r.total_value, 2))
        for r in closed.collect()
    }
    assert got == want
    assert len(want) > 0  # the comparison is non-vacuous


def test_session_state_survives_query_restart(spark, tmp_path):
    """Stop the query between micro-batches and restart from the same
    checkpoint: the open-session state must carry across processes."""
    src = tmp_path / "restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def _run_to_completion():
        stream = (
            spark.readStream.schema("user_id bigint, ts bigint, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        out = sessionize_stream(stream, "user_id", "ts", "value", gap=50)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(1, 0, 1.0), (1, 10, 2.0)], "user_id bigint, ts bigint, value double"
    ).coalesce(1).write.parquet(str(src / "f0"))
    _run_to_completion()
    assert spark.read.parquet(sink).count() == 0  # session still open

    time.sleep(1.1)
    # continues the open session (15 within gap), then closes it (1000)
    spark.createDataFrame(
        [(1, 15, 4.0), (1, 1000, 8.0)], "user_id bigint, ts bigint, value double"
    ).coalesce(1).write.parquet(str(src / "f1"))
    _run_to_completion()
    rows = [
        (r.key, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(sink).collect()
    ]
    # the merged (pre-restart + post-restart) session closed as one unit
    assert rows == [(1, 0, 15, 3, 7.0)]

def test_null_ts_events_are_dropped_by_the_stream_twin(spark, tmp_path):
    # r11 nulls wave: the batch sessionize drops untimestamped events
    # (they cannot sit on the gap timeline) — the stateful stream twin
    # must agree, not poison its run-split arithmetic with NaN
    src = tmp_path / "sess_null_src"
    src.mkdir()
    rows = [(1, 0, 1.0), (1, 10, 2.0), (1, None, 99.0), (1, 2000, 5.0)]
    spark.createDataFrame(rows, "user_id bigint, ts bigint, value double") \
        .coalesce(1).write.parquet(str(src / "f0"))

    got = {
        (r.key, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in _run_stream(spark, str(src / "*"), "sess_null", gap=50).collect()
    }
    # the NULL-ts event contributes nothing; (2000,...) stays open
    assert got == {(1, 0, 10, 2, 3.0)}
