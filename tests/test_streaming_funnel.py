"""Streaming twins of the funnel/attribution pair: the stateful as-of
latency operator and the watermarked touch↔purchase interval join must
reproduce the DuckDB-oracle-checked batch devices row-for-row."""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_spark.plans.advanced_analytics import _ATTR_NS
from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from etl_pipeline_spark.sources.star import load_table
from etl_pipeline_spark.streaming.funnel import (
    asof_latency_stream,
    touches_before_purchases,
)
from etl_pipeline_spark.streaming.joins import run_available_now_append
from etl_pipeline_spark.streaming.windows import events_stream
from tests.conftest import canonicalize

_ensure_loaded()

SF_DIR = "/root/testdata/sf0.001"


def _batch_conversions(spark, sf_dir):
    """The batch as-of device (funnel_latency_quantiles' conv relation)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    return (
        ev.select("event_id", "user_id", "event_type", "ts", last_view.alias("tv"))
        .filter((F.col("event_type") == "purchase") & F.col("tv").isNotNull())
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            F.expr("(ts - tv) DIV 1000000000").alias("latency_sec"),
        )
    )


def test_asof_latency_stream_equals_batch(spark):
    got = run_available_now_append(
        asof_latency_stream(events_stream(spark, SF_DIR)), "asof_lat_events"
    ).toPandas()
    want = _batch_conversions(spark, SF_DIR).toPandas()
    assert len(want) > 0
    assert canonicalize(got).equals(canonicalize(want))


def test_asof_latency_state_spans_micro_batches(spark, tmp_path):
    """A view in batch 1 attributes a purchase in batch 2 (state carry);
    an equal-ns-timestamp view never attributes (strict tv < tp, the
    batch RANGE(-1) bound)."""
    src = tmp_path / "asof_src"
    src.mkdir()
    ns = 1_000_000_000
    f0 = [
        (1, 10, 5 * ns, "view"),
        (2, 11, 7 * ns, "view"),
        (2, 12, 7 * ns, "purchase"),  # same-ns view: must NOT attribute
        (3, 15, 9 * ns, "view"),
    ]
    f1 = [
        (1, 13, 65 * ns, "purchase"),  # attributes to batch-1 view (60 s)
        (1, 14, 70 * ns, "purchase"),  # same state, 65 s
        (3, 16, 9 * ns, "purchase"),  # same-ns view CARRIED IN STATE:
        # must not attribute either (strict bound across batches)
    ]
    schema = "user_id bigint, event_id bigint, ts bigint, event_type string"
    for i, rows in enumerate([f0, f1]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
        time.sleep(1.1)  # distinct mtimes → deterministic batch order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    got = {
        (r.p_id, r.user_id, r.latency_sec)
        for r in run_available_now_append(
            asof_latency_stream(stream), "asof_lat_span"
        ).collect()
    }
    assert got == {(13, 1, 60), (14, 1, 65)}


def test_streaming_attribution_pairs_and_credits_equal_batch(spark):
    from etl_pipeline_spark.operators.rangejoin import bucketed_interval_join

    pairs = run_available_now_append(
        touches_before_purchases(events_stream(spark, SF_DIR), horizon_ns=_ATTR_NS),
        "attr_pairs",
    )
    got_pairs = pairs.select("p_id", "t_id").toPandas()

    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("tp"),
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("tt"),
    )
    want_pairs = (
        bucketed_interval_join(
            purchases,
            touches,
            left_ts="tp",
            right_ts="tt",
            lower_offset=-_ATTR_NS,
            upper_offset=-1,
            bucket_width=_ATTR_NS,
            equi_keys=[("p_user", "t_user")],
        )
        .select("p_id", "t_id")
        .toPandas()
    )
    assert len(want_pairs) > 0
    assert canonicalize(got_pairs).equals(canonicalize(want_pairs))

    # end-to-end: the registered query's credit windows over the DRAINED
    # streamed pairs reproduce the batch attribution report exactly
    w = Window.partitionBy("p_id").orderBy("tt", "t_id")
    wc = Window.partitionBy("p_id")
    pos = pairs.select(
        "p_id",
        "event_type",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wc).alias("n_t"),
    )
    credit = (
        F.when(F.col("n_t") == 1, 1.0)
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("n_t")),
            F.when(F.col("n_t") == 2, 0.5).otherwise(0.4),
        )
        .otherwise(0.2 / (F.col("n_t") - 2))
    )
    got_credits = (
        pos.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.round(F.sum("credit"), 6).alias("credit"),
        )
        .toPandas()
    )
    want_credits = (
        REGISTRY["attribution_credit_events"].spark_fn(spark, SF_DIR).toPandas()
    )
    assert canonicalize(got_credits).equals(canonicalize(want_credits))


def test_asof_state_survives_query_restart(spark, tmp_path):
    """Stop the stream between micro-batches and restart from the same
    checkpoint: the per-user last-view state must carry across
    processes — a purchase in the SECOND run attributes to a view seen
    only in the FIRST run."""
    src = tmp_path / "asof_restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "asof_ckpt")
    sink = str(tmp_path / "asof_sink")
    ns = 1_000_000_000
    schema = "user_id bigint, event_id bigint, ts bigint, event_type string"

    def _run_to_completion():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            asof_latency_stream(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(1, 10, 5 * ns, "view")], schema
    ).coalesce(1).write.parquet(str(src / "f0"))
    _run_to_completion()
    assert spark.read.parquet(sink).count() == 0  # no purchase yet

    time.sleep(1.1)
    spark.createDataFrame(
        [(1, 11, 65 * ns, "purchase")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    _run_to_completion()  # fresh query object, same checkpoint

    got = {
        (r.p_id, r.user_id, r.latency_sec)
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {(11, 1, 60)}  # attributed via RECOVERED state
