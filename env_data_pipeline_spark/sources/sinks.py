"""Dataset sinks with controlled physical layout.

A 100 TB training-data pipeline lives or dies on its output layout:
partition directories that downstream readers can prune, file sizes
big enough to amortize open/seek but small enough to parallelize, and
within-file ordering that compresses well and supports range scans.
These writers make those three knobs explicit. (The reference's sinks
are HTTP JSON responses — shared_schema.py to_dict — so this surface
is engine-native; the JSON document itself is `collect_json_sink`.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    sort_within: Sequence[str] = (),
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a pruned-readable dataset.

    - ``partition_by``: hive-style directory partitioning — readers
      filtering on these columns scan only matching directories
      (PartitionFilters in the plan).
    - ``max_records_per_file``: caps file size without a repartition
      (the writer rolls files per task) — the knob that prevents both
      the 10 GB file and the 10k tiny-file problem.
    - ``sort_within``: sortWithinPartitions before the write — no
      extra shuffle, but parquet gets runs that encode/compress well
      and min/max column stats become selective for range predicates.
    """
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
