"""Shuffle-byte measurement via the Spark UI status store.

The scale story for every broadcast/bucketed plan claim ("the eval
side broadcasts, only corpus grams shuffle", "repetition profiling is
zero-exchange") is strongest as *measured bytes*, not plan shape.
Spark's AppStatusStore records per-stage ``shuffleReadBytes`` /
``shuffleWriteBytes``; with the UI enabled (see ``session.get_spark``)
its REST API exposes them per application. ``measure_shuffle`` wraps
one action in a unique job group, then sums the bytes of exactly the
stages its jobs ran.

On a real cluster the identical numbers come from the history server /
event log — this module is the local[N] stand-in, not a test-only
trick.
"""

from __future__ import annotations

import json
import urllib.request
import uuid
from collections.abc import Callable

__all__ = ["measure_shuffle"]


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as fh:
        return json.load(fh)


def measure_shuffle(spark, action: Callable[[], object]) -> dict[str, int]:
    """Run ``action`` under a unique job group and return its shuffle
    traffic: ``{"read_bytes", "write_bytes", "stages"}``.

    Bytes are summed over the distinct stages of the jobs the action
    submitted (skipped stages — reused exchanges — contribute 0, which
    is exactly right: nothing moved). Requires ``spark.ui.enabled``.
    """
    sc = spark.sparkContext
    if sc.uiWebUrl is None:
        raise RuntimeError("measure_shuffle needs spark.ui.enabled=true")
    group = f"shufflemeter-{uuid.uuid4().hex[:12]}"
    sc.setJobGroup(group, group)
    try:
        action()
    finally:
        sc.setJobGroup("", "")
    # AppStatusStore is fed asynchronously from the listener bus — an
    # immediate REST read can miss trailing stage metrics (or whole
    # jobs) and silently undercount. Drain the bus before reading
    # (ADVICE r6); 10 s is far beyond local-mode event latency.
    sc._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    stage_ids: set[int] = set()
    for job in _rest(spark, "jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job["stageIds"])
    # one REST row per stage ATTEMPT — keep only the latest attempt per
    # stage so a (rare, local-mode) retry isn't double-counted
    latest: dict[int, dict] = {}
    for st in _rest(spark, "stages"):
        sid = st["stageId"]
        if sid in stage_ids and st["status"] != "SKIPPED":
            if sid not in latest or st["attemptId"] > latest[sid]["attemptId"]:
                latest[sid] = st
    read = sum(st.get("shuffleReadBytes", 0) for st in latest.values())
    write = sum(st.get("shuffleWriteBytes", 0) for st in latest.values())
    return {"read_bytes": read, "write_bytes": write, "stages": len(latest)}
