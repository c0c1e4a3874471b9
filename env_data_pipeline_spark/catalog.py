"""Catalog: load the deterministic test tables and register views.

The driver-generated tables (TESTDATA.md) are the engine's base
relations. ``load_tables`` reads them as Parquet scans (columnar,
pushdown-capable); ``register_views`` exposes them to spark.sql so
fixture CTEs (fixtures.py) can be shared verbatim with the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one base table — no caching, Catalyst prunes/pushes.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    cannot read natively: read nanos as long and convert to a
    microsecond timestamp (truncation matches DuckDB's ns->us
    conversion). Set per-read so it works on driver-owned sessions.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        # integer `div`, not `/`: float division loses precision at 1e18 ns
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every base table as a temp view named exactly as in the
    DuckDB oracle, so dialect-common SQL runs on both engines."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
