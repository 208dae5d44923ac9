"""The streaming Holt-Winters must equal the batch recursion applied
per key over the day-domain cells — bit-for-bit (exact cents, dyadic
constants, identical init/step order) — and carry its full forecaster
state across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.plans.ops_analytics import _hw_solve
from etl_pipeline_spark.sources.star import load_table
from etl_pipeline_spark.streaming.holtwinters import holt_winters_stream
from etl_pipeline_spark.streaming.joins import run_available_now_append
from etl_pipeline_spark.streaming.windows import events_stream

SF_DIR = "/root/testdata/sf0.001"

_DAY_NS = 86_400_000_000_000


def _reference_full(cells):
    """Every emitted row (observed day >= 8): replay the stream's exact
    incremental algorithm in pure Python."""
    by_key: dict[str, list] = {}
    for key, day, c in sorted(cells):
        by_key.setdefault(key, []).append((day, c))
    out = {}
    for key, seq in by_key.items():
        if len(seq) < 14:
            continue
        xs = [float(c) for _, c in seq]
        l0 = (((((xs[0] + xs[1]) + xs[2]) + xs[3]) + xs[4]) + xs[5] + xs[6]) / 7.0
        m2 = (((((xs[7] + xs[8]) + xs[9]) + xs[10]) + xs[11]) + xs[12] + xs[13]) / 7.0
        l, b = l0, (m2 - l0) / 7.0
        s = [xs[i] - l0 for i in range(7)]
        for j in range(7, len(xs)):
            ln = 0.5 * (xs[j] - s[0]) + 0.5 * (l + b)
            b = 0.5 * (ln - l) + 0.5 * b
            s = s[1:] + [0.5 * (xs[j] - ln) + 0.5 * s[0]]
            l = ln
            day, c = seq[j]
            out[(key, day)] = (c, l, b, l + b + s[0])
    return out


def test_hw_stream_equals_batch_recursion(spark):
    got = run_available_now_append(
        holt_winters_stream(events_stream(spark, SF_DIR)), "hw_events"
    ).collect()
    cells = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.expr(f"ts DIV {_DAY_NS}").alias("day"))
        .agg(
            F.sum(F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).alias(
                "cents"
            )
        )
        .collect()
    )
    want = _reference_full([(r.event_type, r.day, r.cents) for r in cells])
    assert len(got) == len(want) > 0
    for r in got:
        c, l, b, fc = want[(r.event_type, r.day)]
        assert r.day_cents == c
        assert r.level == l  # exact: identical float64 recursion
        assert r.trend == b
        assert r.forecast_next == fc
    # and the FINAL state per key equals the batch solver end-state
    for key in {r.event_type for r in got}:
        seq = sorted(
            (r.day, r.cents) for r in cells if r.event_type == key
        )
        l, b, s = _hw_solve([float(c) for _, c in seq])
        mine = [r for r in got if r.event_type == key]
        last = max(mine, key=lambda r: r.day)
        assert last.level == l and last.trend == b


def test_hw_state_carries_across_micro_batches(spark, tmp_path):
    """Days 1..14 in batch 1 (init + replay emission), day 15 in batch
    2: the batch-2 row must continue the carried forecaster, equal to
    the one-shot recursion over all 15 days."""
    src = tmp_path / "hw_src"
    src.mkdir()
    vals = [10.0, 12.0, 9.0, 11.0, 10.0, 13.0, 8.0, 11.0, 13.0, 10.0,
            12.0, 11.0, 14.0, 9.0]
    f0 = [
        (i + 1, (i + 1) * _DAY_NS, 1, "a", vals[i], "{}")
        for i in range(14)
    ]
    f1 = [(99, 15 * _DAY_NS, 1, "a", 12.0, "{}")]
    schema = (
        "event_id bigint, ts bigint, user_id bigint,"
        " event_type string, value double, props string"
    )
    for i, rows in enumerate([f0, f1]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}"), mode="overwrite"
        )
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src / "f0")).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )
    got = sorted(
        run_available_now_append(
            holt_winters_stream(stream), "hw_micro"
        ).collect(),
        key=lambda r: r.day,
    )
    # 7 replay rows (days 8..14) + 1 continued row (day 15)
    assert [r.day for r in got] == list(range(8, 16))
    xs = [v * 100 for v in vals] + [1200.0]
    l, b, s = _hw_solve(xs)
    last = got[-1]
    assert last.level == l and last.trend == b
    assert last.forecast_next == l + b + s[0]
