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


def compact_dataset(
    spark,
    path: str,
    target_records_per_file: int = 1_000_000,
    cluster_by: Sequence[str] = (),
    fmt: str = "parquet",
) -> int:
    """Rewrite a dataset into right-sized files — the maintenance pass
    every long-lived 100 TB store needs (streaming sinks and
    fine-grained partition writes both accrete small files; read
    throughput then drops to open/seek overhead).

    - File count is computed from the ACTUAL row count, so compaction
      adapts as the dataset grows; ``repartition(n)`` (round-robin)
      spreads rows evenly regardless of input skew.
    - ``cluster_by``: optional range-clustering instead — files carry
      disjoint key ranges, so min/max stats prune file-level for
      range predicates (the poor man's Z-order for one key prefix).
    - Writes to a sibling temp dir then swaps; a crash between the two
      swap renames leaves the data intact in the `._compact_old`
      sibling, and the next compact_dataset call restores it before
      proceeding. Returns the new file count. (On an object store the
      swap would be a manifest commit — table-format territory:
      Delta/Iceberg.)
    """
    import glob
    import os
    import shutil

    bak = path.rstrip("/") + "._compact_old"
    if not os.path.exists(path) and os.path.exists(bak):
        # prior run crashed mid-swap: the backup IS the live data
        os.rename(bak, path)

    # Hive-partitioned input: the rewrite must preserve the partition
    # LAYOUT (or downstream pruning is silently lost) and the partition
    # VALUES (inference would re-type '01' -> 1 and bake the re-typed
    # value in as a data column). Detect key=value subdir levels and
    # read with partition-column type inference off so values stay the
    # literal directory strings.
    pcols = _hive_partition_cols(path)
    if pcols:
        prev_inf = spark.conf.get(
            "spark.sql.sources.partitionColumnTypeInference.enabled"
        )
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", "false"
        )
        try:
            df = spark.read.format(fmt).load(path)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionColumnTypeInference.enabled", prev_inf
            )
    else:
        df = spark.read.format(fmt).load(path)
    if fmt == "parquet":
        # row count from footer metadata: no data scan
        import pyarrow.parquet as pq

        files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        n_rows = (
            sum(pq.ParquetFile(f).metadata.num_rows for f in files)
            if files
            else df.count()
        )
    else:
        n_rows = df.count()
    n_files = max(1, -(-n_rows // target_records_per_file))
    if cluster_by:
        out = df.repartitionByRange(n_files, *pcols, *cluster_by).sortWithinPartitions(
            *pcols, *cluster_by
        )
    elif pcols:
        # co-locate each hive partition's rows so the per-directory
        # file count stays ~1 task's worth instead of n_files slices
        out = df.repartition(n_files, *pcols)
    else:
        out = df.repartition(n_files)
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = out.write.mode("overwrite").format(fmt)
    if pcols:
        writer = writer.partitionBy(*pcols)
    writer.save(tmp)
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return len(
        [
            f
            for f in glob.glob(os.path.join(path, "**", "part-*"), recursive=True)
            if not f.endswith(".crc")
        ]
    )


def _hive_partition_cols(path: str) -> list[str]:
    """Partition column names from nested key=value directory levels
    (one name per level, outermost first); [] when unpartitioned."""
    import os

    cols: list[str] = []
    p = path
    while True:
        subs = [
            d
            for d in os.listdir(p)
            if "=" in d and os.path.isdir(os.path.join(p, d))
        ]
        if not subs:
            return cols
        keys = {d.split("=", 1)[0] for d in subs}
        if len(keys) != 1:
            # mixed keys at one level is not hive layout — treat as flat
            return []
        cols.append(keys.pop())
        p = os.path.join(p, subs[0])
