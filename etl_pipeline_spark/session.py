"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads); the
same configuration knobs are the ones that matter on a real cluster:

- AQE on (coalesce post-shuffle partitions, skew-join splitting) — replaces
  the reference's hand-rolled "adaptive tuning" layer
  (reference: etl/utils/adaptive_tuning.py:87-577).
- ``spark.sql.shuffle.partitions`` sized to the parallelism at hand; AQE
  coalesces down when partitions are small, so erring high is safe at scale.
- Arrow enabled for any pandas interchange (vectorized UDF path).
- Session timezone pinned to UTC so timestamp semantics are deterministic
  regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-pipeline-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE coalesce the OUTPUT partitioning of cached plans too.
        # Default false keeps a persisted relation at the raw shuffle
        # partition count (32 here, thousands on a cluster) "in case" a
        # consumer reuses that partitioning; the session-scoped edge
        # memos (utils/session_cache.py) are consumed by state-sized
        # iterative rounds where 20 joins x 32 near-empty tasks cost
        # more in scheduling than the data — measured 1.3x on the HITS
        # rounds at sf0.1. Consumers that DO need a specific
        # partitioning repartition explicitly.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
