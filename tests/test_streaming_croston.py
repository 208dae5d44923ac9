"""The streaming Croston must equal the batch closed-form weighted sum
per key — bit-for-bit (alpha = 1/2 exactly: every smoothing weight is a
binary fraction, products and partial sums stay exact over the test
corpus) — and carry its four-scalar state across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_spark.plans.commerce import croston_demand_forecast
from etl_pipeline_spark.sources.star import load_table
from etl_pipeline_spark.streaming.croston import croston_stream
from etl_pipeline_spark.streaming.joins import run_available_now_append

SF_DIR = "/root/testdata/sf0.001"


def _month_cells(spark, sf_dir):
    """The batch query's single fact pass: (part, month) demand epochs."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").cast("bigint").alias("l_partkey"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
            .cast("bigint")
            .alias("m"),
            F.expr("CAST(l_quantity AS BIGINT)").alias("qi"),
        )
        .groupBy("l_partkey", "m")
        .agg(F.sum("qi").cast("bigint").alias("q"))
    )


def test_croston_stream_equals_batch(spark, tmp_path):
    cells = _month_cells(spark, SF_DIR)
    m0 = cells.agg(F.min("m")).collect()[0][0]
    src = str(tmp_path / "cr_src")
    cells.write.parquet(src)
    stream = spark.readStream.schema(
        "l_partkey bigint, m bigint, q bigint"
    ).parquet(src)
    got = run_available_now_append(
        croston_stream(stream, m0=int(m0)), "cr_events"
    ).collect()
    # the stream revises per epoch; the batch row is each key's LAST
    final = {}
    for r in got:
        if r.l_partkey not in final or r.m > final[r.l_partkey].m:
            final[r.l_partkey] = r
    want = {r.l_partkey: r for r in croston_demand_forecast(spark, SF_DIR).collect()}
    assert set(final) == set(want) and len(want) > 0
    for pk, w in want.items():
        g = final[pk]
        assert g.n_epochs == w.n_epochs
        assert g.size_ewma == w.size_ewma  # exact: dyadic recursion
        assert g.interval_ewma == w.interval_ewma
        assert g.croston_forecast == w.croston_forecast
    # intermediate emissions: one row per epoch from the second on
    n_epochs_total = sum(w.n_epochs for w in want.values())
    assert len(got) == n_epochs_total - len(want)


def test_croston_state_carries_across_micro_batches(spark, tmp_path):
    """Epochs 1-2 in micro-batch 1, epoch 3 in micro-batch 2: the batch-2
    row must continue the carried (n, last_m, z, y), equal to the
    one-shot recursion over all three epochs."""
    src = tmp_path / "cr_micro"
    src.mkdir()
    f0 = [(1, 600, 8), (1, 603, 4)]
    f1 = [(1, 607, 10)]
    for i, rows in enumerate([f0, f1]):
        spark.createDataFrame(
            rows, "l_partkey bigint, m bigint, q bigint"
        ).coalesce(1).write.parquet(str(src / f"f{i}"), mode="overwrite")
    stream = (
        spark.readStream.schema("l_partkey bigint, m bigint, q bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    got = sorted(
        run_available_now_append(
            croston_stream(stream, m0=600), "cr_micro_q"
        ).collect(),
        key=lambda r: r.m,
    )
    assert [r.m for r in got] == [603, 607]
    # one-shot recursion: z1=8, y1=1; z2=.5*4+.5*8=6, y2=.5*3+.5*1=2;
    # z3=.5*10+.5*6=8, y3=.5*4+.5*2=3
    assert (got[0].size_ewma, got[0].interval_ewma) == (6.0, 2.0)
    assert got[0].croston_forecast == 3.0
    assert (got[1].size_ewma, got[1].interval_ewma) == (8.0, 3.0)
    assert got[1].n_epochs == 3
    assert got[1].croston_forecast == 2.666667  # HALF_UP(8/3, 6dp)


def test_croston_state_survives_query_restart(spark, tmp_path):
    """Stop the stream and restart from the same checkpoint: the
    four-scalar (n, last_m, z, y) state must carry across query
    objects — the second run's epoch blends state seen only in the
    first run."""
    import time

    src = tmp_path / "cr_restart_src"
    src.mkdir()
    ckpt = str(tmp_path / "cr_ckpt")
    sink = str(tmp_path / "cr_sink")
    schema = "l_partkey bigint, m bigint, q bigint"

    def _run_to_completion():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            croston_stream(stream, m0=600)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame([(1, 600, 8), (1, 603, 4)], schema).coalesce(
        1
    ).write.parquet(str(src / "f0"))
    _run_to_completion()

    time.sleep(1.1)
    spark.createDataFrame([(1, 607, 10)], schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    _run_to_completion()  # fresh query object, same checkpoint

    got = {r.m: r for r in spark.read.parquet(sink).collect()}
    assert set(got) == {603, 607}
    # epoch 3 blends RECOVERED state: z = .5*10 + .5*6, y = .5*4 + .5*2
    assert (got[607].size_ewma, got[607].interval_ewma) == (8.0, 3.0)
    assert got[607].n_epochs == 3
