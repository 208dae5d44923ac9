"""Structured Streaming surface: availableNow drain over the events parquet
must equal the DuckDB-oracle-checked batch plans (the semantics contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_stream_stream_interval_join_equals_batch(spark):
    """The watermarked stream-stream interval join must emit exactly the
    pairs the batch bucketed interval join produces."""
    from etl_pipeline_spark.operators.rangejoin import bucketed_interval_join
    from etl_pipeline_spark.sources.star import load_table
    from etl_pipeline_spark.streaming.joins import (
        clicks_before_purchases,
        run_available_now_append,
    )

    stream = events_stream(spark, SF_DIR)
    got = (
        run_available_now_append(clicks_before_purchases(stream), "ssj_test")
        .select("purchase_id", "click_time", "click_value")
        .toPandas()
    )

    hour_ns = 3_600_000_000_000
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    )
    want = (
        bucketed_interval_join(
            purchases, clicks, "p_ts", "c_ts", -hour_ns, 0, hour_ns,
            equi_keys=(("p_user", "c_user"),),
        )
        .select(
            "purchase_id",
            F.timestamp_micros(F.expr("c_ts div 1000")).alias("click_time"),
            "click_value",
        )
        .toPandas()
    )
    assert canonicalize(got).equals(canonicalize(want))


def test_stream_merge_upsert_cdc(spark, tmp_path):
    """Two micro-batches with overlapping keys stream-merge into a table:
    final state is one row per key with the latest value."""
    from etl_pipeline_spark.streaming.windows import stream_merge_to_table

    spark.sql("CREATE DATABASE IF NOT EXISTS cdc_db")
    try:
        src = tmp_path / "cdc_src"
        spark.createDataFrame(
            [(1, "a0"), (2, "b0")], "id bigint, val string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
        spark.createDataFrame(
            [(2, "b1"), (3, "c0")], "id bigint, val string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
        stream = (
            spark.readStream.schema("id bigint, val string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        stream_merge_to_table(
            stream, "cdc_db.materialized", key_cols=["id"],
            checkpoint=str(tmp_path / "cdc_ckpt"),
        )
        got = sorted((r.id, r.val) for r in spark.table("cdc_db.materialized").collect())
        assert got == [(1, "a0"), (2, "b1"), (3, "c0")]
    finally:
        spark.sql("DROP DATABASE IF EXISTS cdc_db CASCADE")


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    from etl_pipeline_spark.streaming.joins import enrich_with_dimension
    from etl_pipeline_spark.streaming.windows import events_stream
    from etl_pipeline_spark.sources.star import load_table

    sf = SF_DIR
    dim = (
        load_table(spark, sf, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    enriched = enrich_with_dimension(events_stream(spark, sf), dim, ["user_id"])
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("enrich_check")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.c_mktsegment: (r.n, r.total)
        for r in spark.sql("SELECT * FROM enrich_check").collect()
    }
    events = load_table(spark, sf, "events")
    want = {
        r.c_mktsegment: (r.n, r.total)
        for r in events.join(dim, "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == want and len(got) > 1


def test_streaming_drift_psi_equals_batch_query(spark):
    """Streamed current-half histogram + batch reference must reproduce the
    oracle-checked batch PSI (sql_drift_psi_event_values) per event type."""
    from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
    from etl_pipeline_spark.sources.star import load_table

    _ensure_loaded()
    from etl_pipeline_spark.streaming.drift import bin_expr, psi_score, value_histogram

    ev = load_table(spark, SF_DIR, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()

    ref = (
        ev.filter(F.col("event_id") % 2 == 0)
        .groupBy("event_type", bin_expr("value", lo, hi, 10).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stream = events_stream(spark, SF_DIR).filter(F.col("event_id") % 2 == 1)
    streamed = run_available_now(
        value_histogram(stream, lo, hi, nbins=10, window="6 hours"), "drift_hist_test"
    )
    got = {
        r.event_type: (r.psi, r.n_bins)
        for r in psi_score(streamed.select("event_type", "bin", "n"), ref).collect()
    }
    want = {
        r.event_type: (r.psi, r.n_bins)
        for r in REGISTRY["sql_drift_psi_event_values"].spark_fn(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1]          # same observed-bin count
        assert abs(got[k][0] - want[k][0]) <= 1e-6  # same PSI to rounding


def test_streaming_hll_registers_equal_batch_build(spark):
    """Windowed streamed HLL registers must equal a batch
    hll_build_grouped over the same window slices exactly — the register
    relation is the state, so this pins streaming distinct-count
    semantics to the oracle-checked batch sketch."""
    from etl_pipeline_spark.operators.sketch import (
        hll_build_grouped,
        hll_estimate_grouped,
    )
    from etl_pipeline_spark.sources.star import load_table
    from etl_pipeline_spark.streaming.cardinality import windowed_hll_registers
    from etl_pipeline_spark.streaming.windows import events_stream, run_available_now

    stream = events_stream(spark, SF_DIR)
    got = run_available_now(
        windowed_hll_registers(stream, id_col="user_id", p=6, window="6 hours"),
        "hll_regs_test",
    )

    ev = (
        load_table(spark, SF_DIR, "events")
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .withColumn(
            "win_start_epoch",
            F.unix_timestamp(F.window("event_time", "6 hours").start),
        )
    )
    want = hll_build_grouped(
        ev.select("win_start_epoch", "event_type", "user_id"),
        ["win_start_epoch", "event_type"],
        "user_id",
        p=6,
    ).withColumnRenamed("rho_max", "rho_max")

    g = sorted(map(tuple, got.select("win_start_epoch", "event_type", "idx", "rho_max").collect()))
    w = sorted(map(tuple, want.select("win_start_epoch", "event_type", "idx", "rho_max").collect()))
    assert g == w and len(g) > 0

    # estimates over the drained registers are sane for the tiny user pool
    est = hll_estimate_grouped(
        got.select("win_start_epoch", "event_type", "idx", "rho_max"),
        ["win_start_epoch", "event_type"],
        p=6,
    )
    n_users = ev.select("user_id").distinct().count()
    for r in est.collect():
        assert 0 < r.est  # raw band not guaranteed at this cardinality
        assert r.n_set <= min(64, n_users)


def test_streaming_cms_cells_equal_batch_build(spark):
    """Windowed streamed CMS cells must equal a batch cms_build over the
    same window slices exactly — counts are the state, so this pins
    streaming frequency-sketch semantics to the oracle-checked batch
    sketch (the frequency member of the streaming sketch family next to
    HLL registers and drift histograms)."""
    from etl_pipeline_spark.operators.sketch import cms_build
    from etl_pipeline_spark.sources.star import load_table
    from etl_pipeline_spark.streaming.frequency import windowed_cms_cells
    from etl_pipeline_spark.streaming.windows import events_stream, run_available_now

    stream = events_stream(spark, SF_DIR)
    got = run_available_now(
        windowed_cms_cells(stream, key_col="user_id", depth=3, width=256, window="6 hours"),
        "cms_cells_test",
    )

    ev = (
        load_table(spark, SF_DIR, "events")
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
        .withColumn(
            "win_start_epoch",
            F.unix_timestamp(F.window("event_time", "6 hours").start),
        )
    )
    wins = [r.win_start_epoch for r in ev.select("win_start_epoch").distinct().collect()]
    g_all = sorted(map(tuple, got.select("win_start_epoch", "d", "bucket", "cnt").collect()))
    w_all = []
    for w0 in wins:
        batch = cms_build(
            ev.filter(F.col("win_start_epoch") == w0).select("user_id"),
            "user_id",
            depth=3,
            width=256,
        )
        w_all.extend((w0, r.d, r.bucket, r.cnt) for r in batch.collect())
    assert g_all == sorted(w_all) and len(g_all) > 0


def test_windowed_heavy_hitters_reads_the_streaming_cell_store(spark):
    """The registered windowed_heavy_hitters query estimates from a cell
    relation that must be EXACTLY what the streaming CMS maintains: pin
    the query's batch cell builder cell-for-cell against the drained
    Structured Streaming aggregate at the same (depth, width, window)."""
    from etl_pipeline_spark.plans.streaming_batch import windowed_cms_cells_batch
    from etl_pipeline_spark.sources.star import load_table
    from etl_pipeline_spark.streaming.frequency import windowed_cms_cells
    from etl_pipeline_spark.streaming.windows import events_stream, run_available_now

    stream = events_stream(spark, SF_DIR)
    streamed = run_available_now(
        windowed_cms_cells(stream, key_col="user_id", depth=3, width=256, window="6 hours"),
        "whh_cells_test",
    )
    batch = windowed_cms_cells_batch(
        load_table(spark, SF_DIR, "events"), "user_id", depth=3, width=256
    )
    s = sorted(map(tuple, streamed.select("win_start_epoch", "d", "bucket", "cnt").collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b and len(s) > 0


def test_streaming_dedup_exact_equals_batch_first_seen(spark):
    """Streamed dropDuplicates(user_id) must keep exactly one row per user;
    the KEY SET must equal the batch distinct key set over the same slice
    (which row survives per key is an ordering artifact in both engines —
    the set of survivors' keys is the defined semantics)."""
    from etl_pipeline_spark.sources.star import load_table
    from etl_pipeline_spark.streaming.dedup import dedup_stream_exact
    from etl_pipeline_spark.streaming.windows import events_stream, run_available_now

    stream = events_stream(spark, SF_DIR)
    got = run_available_now(
        dedup_stream_exact(stream, ["user_id"]), "dedup_exact_test",
        output_mode="append",
    )
    assert got.count() == got.select("user_id").distinct().count()
    s_keys = {r.user_id for r in got.select("user_id").collect()}
    b_keys = {
        r.user_id
        for r in load_table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    }
    assert s_keys == b_keys and len(s_keys) > 0


def test_streaming_dedup_within_watermark_bounded_state(spark):
    """dropDuplicatesWithinWatermark: still at most one row per key within
    the horizon for this bounded slice, and every key survives — the
    bounded-state variant must not drop keys, only duplicates."""
    from etl_pipeline_spark.sources.star import load_table
    from etl_pipeline_spark.streaming.dedup import dedup_stream_within_watermark
    from etl_pipeline_spark.streaming.windows import events_stream, run_available_now

    stream = events_stream(spark, SF_DIR)
    got = run_available_now(
        dedup_stream_within_watermark(stream, ["user_id"], watermark="10 days"),
        "dedup_wm_test",
        output_mode="append",
    )
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert got.select("user_id").distinct().count() == n_users
    # availableNow over one static slice: watermark only advances between
    # triggers, so every duplicate inside the slice is suppressed
    assert got.count() == n_users


def test_streaming_quantile_cells_equal_batch(spark):
    """windowed_quantiles consumes a windows × bins cell relation; the
    streaming value histogram maintains exactly that state incrementally.
    Pinned equal per (window, bin) under fixed lo/hi and one global key."""
    from etl_pipeline_spark.sources.star import load_table
    from etl_pipeline_spark.streaming.drift import bin_expr, value_histogram
    from etl_pipeline_spark.streaming.windows import events_stream, run_available_now

    ev = load_table(spark, SF_DIR, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    stream = events_stream(spark, SF_DIR).withColumn("k", F.lit("all"))
    streamed = run_available_now(
        value_histogram(stream, lo, hi, nbins=32, window="6 hours", key_col="k"),
        "wq_cells_test",
    )
    got = {(r.win_start_epoch, r.bin): r.n for r in streamed.collect()}
    batch = ev.groupBy(
        F.expr("(ts div 21600000000000) * 21600").alias("w"),
        bin_expr("value", lo, hi, 32).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("n"))
    want = {(r.w, r.bin): r.n for r in batch.collect()}
    assert got == want
    assert len(want) > 100  # non-trivial state
