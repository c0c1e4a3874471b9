"""Bucketed-table co-located joins (SURVEY.md §7 scale notes).

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle.
Writing both sides bucketed (and sorted) by the join key pins an
identical hash-partitioning into the table layout, so every future
join/aggregation on that key reads co-located buckets and the
exchange disappears from the plan entirely — the join cost becomes a
per-bucket merge. This is the batch analog of co-partitioned Kafka
topics, and the standard physical design for repeatedly-joined
training-data tables (documents x annotations, events x sessions).

tests/test_physical_plans.py::test_bucketed_join_elides_shuffle
proves the property on the engine: the bucketed plan contains a
SortMergeJoin with NO Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    n_buckets: int,
    *keys: str,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table
    registered as ``name``. ``path`` makes it an external table so the
    layout lands where the caller controls (no dependence on the
    session's warehouse dir)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
