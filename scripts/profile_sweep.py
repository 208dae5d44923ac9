"""Registry-wide profile sweep: one warm execution per query with the noop
sink, recording wall seconds, job/stage counts, total executor run time and
the largest single-task stage time — the numbers that separate
scheduling-bound queries (many jobs/stages, tiny executor time) from
single-task-bound ones (guide §2.5/§2.6) without eyeballing 272 UIs.

Usage: python scripts/profile_sweep.py [out.json] [query ...]
  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_spark.plans.registry import REGISTRY, _ensure_loaded
from etl_pipeline_spark.session import get_spark


def _api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_sweep.json"
    spark = get_spark(app_name="profile-sweep", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_loaded()
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    names = sys.argv[2:] or list(REGISTRY)
    REGISTRY["q1_pricing_summary"].spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    report: dict[str, dict] = {}
    for name in names:
        fn = REGISTRY[name].spark_fn
        try:
            # warm-up (memo builds, codegen), then timed
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            jobs_before = {j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 — record and continue
            report[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        jobs = [
            j
            for j in _api(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stage_ids = {s for j in jobs for s in j["stageIds"]}
        stages = [
            s
            for s in _api(port, f"applications/{app_id}/stages?status=complete")
            if s["stageId"] in stage_ids
        ]
        single = [s for s in stages if s["numCompleteTasks"] == 1]
        report[name] = {
            "wall": round(wall, 3),
            "jobs": len(jobs),
            "stages": len(stages),
            "run_s": round(sum(s["executorRunTime"] for s in stages) / 1e3, 3),
            "max1task_s": round(
                max((s["executorRunTime"] for s in single), default=0) / 1e3, 3
            ),
            "shuffleR_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in stages) / 2**20, 2
            ),
        }
        print(f"{name}: {json.dumps(report[name])}", flush=True)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
