"""The streaming EWMA must equal the true per-key recursion computed
from the batch day-domain cells — bit-for-bit (exact cents, dyadic
λ = 1/2, identical recursion order) — and carry state across
micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.sources.star import load_table
from etl_pipeline_spark.streaming.ewma import ewma_stream
from etl_pipeline_spark.streaming.joins import run_available_now_append
from etl_pipeline_spark.streaming.windows import events_stream

SF_DIR = "/root/testdata/sf0.001"

_DAY_NS = 86_400_000_000_000


def _reference_recursion(cells):
    """cells: [(key, day, cents)] → {(key, day): (cents, z)} by the
    ascending-day recursion z = x/2 + z_prev/2 (z0 = x0)."""
    out, z = {}, {}
    for key, day, c in sorted(cells):
        x = float(c)
        z[key] = x if key not in z else 0.5 * x + 0.5 * z[key]
        out[(key, day)] = (c, z[key])
    return out


def test_ewma_stream_equals_batch_recursion(spark):
    got = run_available_now_append(
        ewma_stream(events_stream(spark, SF_DIR)), "ewma_events"
    ).collect()
    cells = (
        load_table(spark, SF_DIR, "events")
        .groupBy(
            "event_type", F.expr(f"ts DIV {_DAY_NS}").alias("day")
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias("cents")
        )
        .collect()
    )
    want = _reference_recursion(
        [(r.event_type, r.day, r.cents) for r in cells]
    )
    assert len(got) == len(want) > 0
    for r in got:
        c, z = want[(r.event_type, r.day)]
        assert r.day_cents == c
        assert r.ewma_cents == z  # exact: identical float64 recursion


def test_ewma_state_carries_across_micro_batches(spark, tmp_path):
    """Day 1 in batch 1, day 2 in batch 2 (same key): the batch-2 EWMA
    must blend the carried state, not restart; a second key appearing
    only in batch 2 initializes fresh."""
    src = tmp_path / "ewma_src"
    src.mkdir()
    f0 = [(1, 1 * _DAY_NS, 1, "a", 1.00, "{}")]
    f1 = [
        (2, 2 * _DAY_NS, 1, "a", 3.00, "{}"),
        (3, 2 * _DAY_NS + 7, 1, "a", 1.00, "{}"),  # same day, same batch
        (4, 2 * _DAY_NS, 2, "b", 9.00, "{}"),
    ]
    schema = (
        "event_id bigint, ts bigint, user_id bigint,"
        " event_type string, value double, props string"
    )
    for i, rows in enumerate([f0, f1]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}"), mode="overwrite"
        )

    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src / "f0")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    got = {
        (r.event_type, r.day): (r.day_cents, r.ewma_cents)
        for r in run_available_now_append(
            ewma_stream(stream), "ewma_carry"
        ).collect()
    }
    assert got[("a", 1)] == (100, 100.0)
    # day-2 cells: a: 300+100=400 cents → z = 0.5·400 + 0.5·100 = 250
    assert got[("a", 2)] == (400, 250.0)
    assert got[("b", 2)] == (900, 900.0)  # fresh key initializes to x


def test_ewma_state_survives_query_restart(spark, tmp_path):
    """Stop the stream and restart from the same checkpoint: the
    per-key (day, z) state must carry across query objects — the
    second run's EWMA blends a day seen only in the first run."""
    import time

    src = tmp_path / "ewma_restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "ewma_ckpt")
    sink = str(tmp_path / "ewma_sink")
    schema = (
        "event_id bigint, ts bigint, user_id bigint,"
        " event_type string, value double, props string"
    )

    def _run_to_completion():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            ewma_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(1, 1 * _DAY_NS, 1, "a", 1.00, "{}")], schema
    ).coalesce(1).write.parquet(str(src / "f0"))
    _run_to_completion()

    time.sleep(1.1)
    spark.createDataFrame(
        [(2, 2 * _DAY_NS, 1, "a", 3.00, "{}")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    _run_to_completion()  # fresh query object, same checkpoint

    got = {
        (r.event_type, r.day): (r.day_cents, r.ewma_cents)
        for r in spark.read.parquet(sink).collect()
    }
    assert got[("a", 1)] == (100, 100.0)
    # z = 0.5*300 + 0.5*100 — the 100 came from RECOVERED state
    assert got[("a", 2)] == (300, 200.0)
