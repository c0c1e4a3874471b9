"""Simulate the round driver: drive __spark_entry__.py from a neutral
cwd with a plain SparkSession, compare every query against its DuckDB
oracle at sf0.01 (rows-only where no oracle), and report failures.

Usage:  python scripts/verify_driver_contract.py [sf_dir] [name_substr ...]
Exit code 0 = every check passed. Optional name substrings restrict
the run to matching queries (entry() still runs).
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.chdir("/tmp")  # neutral cwd: catches repo-relative assumptions

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # default driver heap ON PURPOSE: the oracle compare streams
        # results via toLocalIterator (tests/oracle.py), so even the
        # widest sf0.1 result (landfire_viz_arrays, 225k JSON-array
        # rows) must pass without a memory carve-out — r4 verdict item 4.
        # Partition sizing for a 1 GB heap: the synthetic tables
        # compress ~100:1 (57.6M pixel rows = 28 MB parquet), so
        # byte-based defaults (128m splits, 4m file-open cost, 64m AQE
        # advisory) bin-pack the landfire_pixels scan into ~10 tasks of
        # 6M rows each and the partial collect_list aggregation blows
        # the heap. Smaller split/advisory targets keep every task's
        # working set heap-friendly — the same maxPartitionBytes /
        # advisory sizing a real cluster job does, just tuned for a
        # 1 GB local JVM instead of a 16 GB executor.
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "65536")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = len(mod.entry(spark).collect())
    print(f"entry rows: {n}")
    assert n >= 0

    sys.path.insert(0, REPO)
    from tests.oracle import compare

    qs, oracles = mod.queries(), mod.oracle_sql()
    if len(sys.argv) > 2:
        pats = sys.argv[2:]
        qs = {n_: f for n_, f in qs.items() if any(p in n_ for p in pats)}
        if not qs:
            print(f"no queries match {pats!r} — nothing was verified")
            return 1
    fails = []
    for name in sorted(qs):
        try:
            if name in oracles:
                compare(spark, name, qs[name], oracles[name], sf)
            else:
                qs[name](spark, sf).count()
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails.append(name)
            print(f"{name}: FAIL {str(ex)[:300]}")
        # Collect dead broadcast/shuffle state between queries: on the
        # default 1 GB heap a long sweep otherwise accretes residue
        # until a wide query (landfire_viz_arrays at sf0.1) tips over —
        # it passes solo, so the margin is residue, not the plan.
        # Python gc FIRST: py4j holds JVM-side references for every
        # DataFrame/Column the compare touched until Python finalizers
        # send their detach commands — a JVM System.gc() alone cannot
        # free what Python still pins. Both wrapped so a dead JVM
        # doesn't kill the remaining sweep.
        import gc as _pygc

        _pygc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 - JVM may be gone; keep reporting
            pass
    print(f"checked {len(qs)} queries; FAILURES: {fails if fails else 'none'}")
    art = os.environ.get("SPARK_GRAFT_VERIFY_ARTIFACT")
    if art:
        # committed sweep record (VERDICT r10 item 7): which queries
        # were verified green against their oracles at this sf_dir —
        # asserted against the registry by tests/test_bench_contract.py
        import json

        with open(art, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf,
                    "checked": len(qs),
                    "oracle_backed": sum(1 for q in qs if q in oracles),
                    "failures": fails,
                    "queries": {
                        q: ("fail" if q in fails else "pass") for q in qs
                    },
                },
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
