"""Focused best-of-2 bench over a named subset of registry queries.

Usage: python scripts/bench_wave.py q1 q2 ...  (defaults to the graph wave)
Mirrors bench.py's discipline (noop sink, warmup, best-of-2) so numbers
are comparable to BENCH_r*.json per-query entries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_spark import get_spark  # noqa: E402
from etl_pipeline_spark.plans.registry import REGISTRY  # noqa: E402
from bench import _ensure_loaded  # noqa: E402

WAVE = [
    "triangle_cosupplier_stats",
    "kcore_cosupplier_peel",
    "bfs_hops_from_hub",
    "lpa_cosupplier_communities",
    "modularity_cosupplier",
    "assortativity_cosupplier",
    "jaccard_link_prediction",
    "pagerank_part_supplier",
    "textrank_keywords",
    "hits_hub_authority",
]


def main() -> None:
    names = sys.argv[1:] or WAVE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-wave")
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()
    REGISTRY["q1_pricing_summary"].spark_fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    timings = {}
    total = 0.0
    for name in names:
        fn = REGISTRY[name].spark_fn
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
    print(json.dumps({"total": round(total, 3), "queries": timings}))


if __name__ == "__main__":
    main()
