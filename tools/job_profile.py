"""Per-query job/stage/task profiler (guide §1: measure first).

For each named query: one cold run, then REPEAT warm runs (median),
with the Spark UI REST API snapshotted around the warm runs so we can
attribute wall time to job count (driver-loop latency), stage count
(exchange depth), task count (scheduling overhead) and executor compute
(task time sum).

Usage: python tools/job_profile.py [sf_dir] query [query ...]
Env:   SPARK_GRAFT_PROFILE_REPEAT (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.environ.get("SPARK_GRAFT_REPO", "/root/repo")
sys.path.insert(0, REPO)


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]

    import __spark_entry__ as entrymod
    from beacon_data_importer_spark.session import get_spark

    spark = get_spark(app_name="job_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    ui = spark.sparkContext.uiWebUrl
    app_id = _get(f"{ui}/api/v1/applications")[0]["id"]
    base = f"{ui}/api/v1/applications/{app_id}"

    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEAT", "3"))
    out = {}
    for name in names:
        if name not in qs:
            print(f"?? unknown query {name}")
            continue
        fn = qs[name]
        # cold
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.time() - t0
        spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in _get(f"{base}/jobs")}
        stages_before = {s["stageId"] for s in _get(f"{base}/stages")}
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
            spark.catalog.clearCache()
        jobs_after = _get(f"{base}/jobs")
        stages_after = _get(f"{base}/stages")
        new_jobs = [j for j in jobs_after if j["jobId"] not in jobs_before]
        new_stages = [
            s
            for s in stages_after
            if s["stageId"] not in stages_before and s["status"] == "COMPLETE"
        ]
        times.sort()
        rec = {
            "cold_s": round(cold, 3),
            "warm_median_s": round(times[len(times) // 2], 3),
            "warm_min_s": round(times[0], 3),
            "jobs_per_run": round(len(new_jobs) / reps, 1),
            "stages_per_run": round(len(new_stages) / reps, 1),
            "tasks_per_run": round(
                sum(s.get("numCompleteTasks", 0) for s in new_stages) / reps, 1
            ),
            "task_time_s_per_run": round(
                sum(s.get("executorRunTime", 0) for s in new_stages)
                / 1000.0
                / reps,
                2,
            ),
            "shuffle_mb_per_run": round(
                sum(s.get("shuffleWriteBytes", 0) for s in new_stages)
                / 1e6
                / reps,
                2,
            ),
        }
        out[name] = rec
        print(
            f"{name}: warm={rec['warm_median_s']}s (min {rec['warm_min_s']}) "
            f"cold={rec['cold_s']}s jobs={rec['jobs_per_run']} "
            f"stages={rec['stages_per_run']} tasks={rec['tasks_per_run']} "
            f"taskTime={rec['task_time_s_per_run']}s "
            f"shuffle={rec['shuffle_mb_per_run']}MB"
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
