#!/usr/bin/env python
"""Per-stage breakdown of one headline query via the UI REST API.

Usage: python tools/stage_profile.py <query> [runs]
Prints each stage of the LAST timed run: duration, task count,
input/shuffle bytes, and the stage's first named step.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from faexport_db_spark.queries import QUERIES
    from faexport_db_spark.session import get_spark

    spark = get_spark("r09-stage-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warm

    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
    print(f"{name}: best of {runs} = {best:.4f}s")

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    stages.sort(key=lambda s: s["stageId"])
    total = 0
    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        dur = 0.0
        if s.get("completionTime") and sub:
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t1 = time.strptime(s["completionTime"][:-3], "%Y-%m-%dT%H:%M:%S.%f")
            t2 = time.strptime(sub[:-3], "%Y-%m-%dT%H:%M:%S.%f")
            dur = time.mktime(t1) - time.mktime(t2)
        ms1 = s["completionTime"] and s["submissionTime"]
        print(
            f"stage {s['stageId']:4d} attempt {s['attemptId']} "
            f"tasks={s['numCompleteTasks']:3d} "
            f"exec_ms={s['executorRunTime']:6d} cpu_ms={s['executorCpuTime']//1_000_000:6d} "
            f"in={s['inputBytes']:>9d} sh_r={s['shuffleReadBytes']:>8d} sh_w={s['shuffleWriteBytes']:>8d} "
            f"  {s['name'][:70]}"
        )
        total += s["executorRunTime"]
    print("sum executorRunTime ms:", total)


if __name__ == "__main__":
    main()
