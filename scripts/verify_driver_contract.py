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
        # the oracle compare collect()s full result sets; at sf0.1 the
        # wide-row queries (e.g. landfire_viz_arrays: 225k JSON-array
        # rows) overflow the default 1g driver heap and kill the JVM,
        # cascading Connection-refused failures over every later query
        .config("spark.driver.memory", "8g")
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
    print(f"checked {len(qs)} queries; FAILURES: {fails if fails else 'none'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
