"""Per-query optimization loop tool (r12): time named queries at an
SF dir with the bench's protocol shape (warm-up + N timed runs,
median + spread), optionally through the noop sink (guide §1.4), and
capture .explain("formatted") to plans/r12/<query>_<tag>.txt.

Usage:
  python scripts/qtime.py [--sf DIR] [--runs N] [--noop] [--plans TAG] name [name ...]

Unlike bench.py this is a dev tool: it never writes bench artifacts
and its numbers are for relative before/after comparison inside one
session on a quiet host.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from env_data_pipeline_spark.plans import registry  # noqa: E402
from env_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--noop", action="store_true", help="time via noop sink")
    ap.add_argument(
        "--plans",
        default=None,
        metavar="TAG",
        help="write plans/r12/<name>_<TAG>.txt explain captures",
    )
    args = ap.parse_args()

    registry.load_all()
    names = []
    for pat in args.names:
        hits = [n for n in registry.QUERIES if pat == n] or sorted(
            n for n in registry.QUERIES if pat in n
        )
        if not hits:
            print(f"no query matches {pat!r}")
            return 1
        names += [h for h in hits if h not in names]

    spark = get_spark("qtime")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)

    def run_once(name: str) -> float:
        # builder INSIDE the window — the bench times
        # QUERIES[name](spark, sf).count() as one unit, and some
        # builders run real jobs (eager checkpoints, artifact reads)
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, args.sf)
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return time.perf_counter() - t0

    for name in names:
        spark.sparkContext.setJobDescription(f"qtime: {name}")
        if args.plans:
            df = registry.QUERIES[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(mode)
            out = os.path.join(plan_dir, f"{name}_{args.plans}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
        run_once(name)  # warm-up
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        runs = sorted(run_once(name) for _ in range(args.runs))
        med = runs[len(runs) // 2]
        spread = (runs[-1] - runs[0]) / med if med else 0.0
        print(
            f"{name:40s} med={med:7.3f}s  min={runs[0]:7.3f}  "
            f"max={runs[-1]:7.3f}  spread={spread:.2f}"
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
