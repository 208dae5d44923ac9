"""Z-order layout: both dimensions get tight per-file ranges (a plain
single-column sort leaves the other dimension's ranges ~global), and the
clustered write actually prunes files for a 2-D range scan."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from etl_pipeline_spark.sinks.zorder import file_skipping_stats, zorder_dataframe


def _events(spark):
    # 40k synthetic rows over a 200 x 200 grid, shuffled order
    return (
        spark.range(40_000)
        .select(
            (F.col("id") % 200).alias("x"),
            ((F.col("id") * 7919) % 200).alias("y"),
            F.col("id").alias("payload"),
        )
    )


def test_zorder_tightens_both_dims(spark, tmp_path):
    df = _events(spark)

    z_dir = str(tmp_path / "z")
    zorder_dataframe(df, ["x", "y"], num_files=16).write.parquet(z_dir)
    z = file_skipping_stats(glob.glob(z_dir + "/*.parquet"), ["x", "y"])

    s_dir = str(tmp_path / "s")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(s_dir)
    s = file_skipping_stats(glob.glob(s_dir + "/*.parquet"), ["x", "y"])

    # single-dim sort: x tight, y useless (~full range per file)
    assert s.col_coverage["x"] < 0.2
    assert s.col_coverage["y"] > 0.8
    # z-order: BOTH dims well under global range
    assert z.col_coverage["x"] < 0.45
    assert z.col_coverage["y"] < 0.45


def test_zorder_preserves_rows(spark, tmp_path):
    df = _events(spark)
    out = zorder_dataframe(df, ["x", "y"], num_files=8)
    assert out.columns == df.columns
    assert out.count() == df.count()
    assert out.agg(F.sum("payload")).collect()[0][0] == df.agg(F.sum("payload")).collect()[0][0]


def test_zorder_scan_prunes_files(spark, tmp_path):
    z_dir = str(tmp_path / "zp")
    zorder_dataframe(_events(spark), ["x", "y"], num_files=16).write.parquet(z_dir)
    total = len(glob.glob(z_dir + "/*.parquet"))
    # 2-D box covering ~1/16 of the grid area
    hit = (
        spark.read.parquet(z_dir)
        .filter((F.col("x").between(0, 49)) & (F.col("y").between(0, 49)))
    )
    # check via footer stats which files CAN match the box
    stats_hits = 0
    import pyarrow.parquet as pq

    for p in glob.glob(z_dir + "/*.parquet"):
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        xmn = min(md.row_group(r).column(idx["x"]).statistics.min for r in range(md.num_row_groups))
        xmx = max(md.row_group(r).column(idx["x"]).statistics.max for r in range(md.num_row_groups))
        ymn = min(md.row_group(r).column(idx["y"]).statistics.min for r in range(md.num_row_groups))
        ymx = max(md.row_group(r).column(idx["y"]).statistics.max for r in range(md.num_row_groups))
        if xmn <= 49 and xmx >= 0 and ymn <= 49 and ymx >= 0:
            stats_hits += 1
    assert stats_hits < total / 2  # most files skippable for a 1/16-area box
    # and the result is still correct
    assert hit.count() == _events(spark).filter(
        (F.col("x").between(0, 49)) & (F.col("y").between(0, 49))
    ).count()


def test_compact_with_zorder(spark, tmp_path):
    from etl_pipeline_spark.sinks.maintenance import compact_table
    from etl_pipeline_spark.sinks.zorder import file_skipping_stats

    spark.sql("CREATE DATABASE IF NOT EXISTS zc_test")
    try:
        t = "zc_test.events_z"
        _events(spark).repartition(24).write.mode("overwrite").saveAsTable(t)
        rep = compact_table(spark, t, target_file_bytes=1 << 20, zorder_cols=["x", "y"])
        assert rep.files_after <= rep.files_before
        stats = file_skipping_stats(list(spark.table(t).inputFiles()), ["x", "y"])
        files = len(spark.table(t).inputFiles())
        if files > 4:  # with enough files both dims must tighten
            assert stats.col_coverage["x"] < 0.8
            assert stats.col_coverage["y"] < 0.8
        assert spark.table(t).count() == 40_000
    finally:
        spark.sql("DROP DATABASE IF EXISTS zc_test CASCADE")
