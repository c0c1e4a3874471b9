"""SparkSession factory.

Single place where execution-engine knobs are set, so tests, bench
and the driver contract all run the same configuration.

Scale posture (local[N] today, 1000-executor cluster tomorrow):
- AQE on: runtime join-strategy switching, skew-join splitting and
  partition coalescing replace hand-tuned shuffle counts at scale.
- Arrow on: every Pandas-UDF boundary (raster kernels, MinHash,
  embedding ops) is vectorized batch transfer, not per-row pickle.
- shuffle.partitions defaults to the local core count; on a real
  cluster this is overridden per-job (or left to AQE's coalescing).
- session timezone pinned to UTC so timestamp semantics agree with
  the DuckDB oracle and are cluster-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "env_data_pipeline_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "90g"))
        # UI on a random free port: the status store behind its REST API
        # is how bench.py and the shuffle-pin tests read per-stage
        # shuffle read/write bytes (benchmetrics.measure_shuffle) — the
        # bytes that prove the broadcast/bucketed plan claims.
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
