"""Table maintenance: small-file compaction.

Streaming appends and per-source micro-batches (the reference's per-source
staging writes, etl/loaders/filegdb.py:123-173) leave tables as thousands
of tiny files; at 100 TB the scan-planning and open-file overhead dominate
query time. Compaction rewrites a table into ~target-sized files.

The rewrite stages through a sibling table (same reason as merge_upsert:
Spark cannot overwrite a file-based table it reads in one job); an ACID
format replaces this with OPTIMIZE/rewrite-data-files. Sizing uses the
actual on-disk bytes from the filesystem, not row counts — compression
ratios vary too much for row-based estimates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionReport:
    table: str
    files_before: int
    files_after: int
    bytes_total: int
    target_file_bytes: int


def _table_file_sizes(spark: SparkSession, table: str) -> list[int]:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sizes = []
    for uri in spark.table(table).inputFiles():
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(conf)
        sizes.append(fs.getFileStatus(path).getLen())
    return sizes


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 << 20,
    zorder_cols: list[str] | None = None,
) -> CompactionReport:
    """Rewrite `table` into ⌈bytes/target⌉ files. No-op (no rewrite) when
    the table already has that many files or fewer.

    With ``zorder_cols``, the rewrite lays rows out along the Z-curve of
    those columns (Delta/Iceberg ``OPTIMIZE ZORDER BY`` on plain parquet)
    — same shuffle count as a plain compaction, but every later
    conjunctive range scan on the z-columns prunes files from footer
    stats. A z-ordered compaction never no-ops: improving layout is the
    point even when the file count is already right.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    sizes = _table_file_sizes(spark, table)
    total = sum(sizes)
    n_target = max(1, math.ceil(total / target_file_bytes))
    if len(sizes) <= n_target and not zorder_cols:
        return CompactionReport(table, len(sizes), len(sizes), total, target_file_bytes)
    df = spark.table(table)
    cols = df.columns
    staging = f"{table}__compact_staging"
    if zorder_cols:
        from etl_pipeline_spark.sinks.zorder import zorder_dataframe

        shaped = zorder_dataframe(df, zorder_cols, num_files=n_target)
    else:
        shaped = df.repartition(n_target)
    shaped.write.mode("overwrite").saveAsTable(staging)
    try:
        spark.table(staging).select(*cols).write.insertInto(table, overwrite=True)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {staging}")
    return CompactionReport(
        table, len(sizes), len(spark.table(table).inputFiles()), total, target_file_bytes
    )
