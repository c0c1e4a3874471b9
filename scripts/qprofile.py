"""Per-stage profile of one registered query (r12 optimization loop):
run the query once under a job group, then dump each stage's wall
time, task count, executor-cpu sum, shuffle bytes and name — the
where-does-the-time-go evidence the guide's §1 empirical loop needs.

Usage: python scripts/qprofile.py [--sf DIR] [--floor 0|1] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from env_data_pipeline_spark.plans import registry
    from env_data_pipeline_spark.session import get_spark

    registry.load_all()
    spark = get_spark("qprofile")
    sc = spark.sparkContext

    def rest(path):
        base = sc.uiWebUrl
        app = sc.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/{path}"
        ) as fh:
            return json.load(fh)

    # warm-up
    registry.QUERIES[args.name](spark, args.sf).count()
    import gc

    gc.collect()
    sc._jvm.System.gc()

    group = f"qprofile-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, group)
    t0 = time.perf_counter()
    for _ in range(args.runs):
        registry.QUERIES[args.name](spark, args.sf).count()
    wall = (time.perf_counter() - t0) / args.runs
    sc.setJobGroup("", "")
    sc._jsc.sc().listenerBus().waitUntilEmpty(10_000)

    stage_ids = set()
    n_jobs = 0
    for job in rest("jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job["stageIds"])
            n_jobs += 1
    latest = {}
    for st in rest("stages"):
        sid = st["stageId"]
        if sid in stage_ids:
            if sid not in latest or st["attemptId"] > latest[sid]["attemptId"]:
                latest[sid] = st
    print(f"{args.name}: wall={wall:.3f}s  jobs={n_jobs}  stages={len(latest)} (x{args.runs} runs)")
    rows = sorted(
        latest.values(),
        key=lambda s: (s.get("executorRunTime") or 0),
        reverse=True,
    )
    tot_run = sum((s.get("executorRunTime") or 0) for s in rows)
    print(f"  sum executorRunTime={tot_run/1000:.3f}s (all runs)")
    for st in rows[:18]:
        dur = (st.get("executorRunTime") or 0) / 1000
        cpu = (st.get("executorCpuTime") or 0) / 1e9
        nt = st.get("numCompleteTasks", st.get("numTasks"))
        sr = st.get("shuffleReadBytes", 0)
        sw = st.get("shuffleWriteBytes", 0)
        inb = st.get("inputBytes", 0)
        name = (st.get("name") or "")[:70]
        status = st["status"]
        print(
            f"  [{st['stageId']:4d}] run={dur:7.3f}s cpu={cpu:7.3f}s tasks={nt:3} "
            f"in={inb:>9} sr={sr:>9} sw={sw:>9} {status[:4]:4s} {name}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
