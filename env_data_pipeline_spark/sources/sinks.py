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


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    seed: int,
    id_col: str = "doc_id",
) -> None:
    """Deterministic seeded GLOBAL shuffle + balanced shard write —
    the step that fixes a training run's data order before packing
    (VERDICT r10 item 5). Every row gets the engine-wide 48-bit
    md5-prefix hash of ``seed:id``: the hash IS the global training
    order (seeded, engine-independent, reproducible on any writer),
    its modulo is the shard, and because md5 is uniform the shards
    are balanced with no salting. The physical plan is exactly ONE
    exchange — repartition on shard_id — followed by
    sortWithinPartitions on the order key, so each output shard
    directory holds its slice of the global order contiguously:
    reading shard files in (shard, file-order) replays the seeded
    permutation. plans/llmops.py::corpus_shuffle_shards is the
    oracle-checked manifest of the same (hash, shard, order)
    assignment — its n_docs column is this layout's pre-commit
    balance audit (corpus_shard_balance buckets by the UNSEEDED
    md5(doc_id), a different assignment of the same uniform family)."""
    from pyspark.sql import functions as F

    from env_data_pipeline_spark.extensions.text import md5_prefix_hash

    keyed = df.withColumn(
        "_h",
        md5_prefix_hash(
            F.concat(
                F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string")
            )
        ),
    ).withColumn("shard_id", (F.col("_h") % n_shards).cast("int"))
    # the sort leads with shard_id: FileFormatWriter requires rows
    # ordered by the partition columns and would otherwise insert its
    # own NON-STABLE sort on shard_id alone, scrambling the _h order
    # inside each shard file (found the hard way — the order test)
    write_dataset(
        keyed.repartition(n_shards, "shard_id"),
        path,
        partition_by=("shard_id",),
        sort_within=("shard_id", "_h", id_col),
    )


def _restore_crashed_swap(path: str) -> None:
    """If a prior compaction died between the two swap renames, the
    '._compact_old' sibling IS the live data — put it back."""
    import os

    bak = path.rstrip("/") + "._compact_old"
    if not os.path.exists(path) and os.path.exists(bak):
        os.rename(bak, path)


def _read_preserving_partitions(spark, path: str, fmt: str):
    """Read a dataset keeping hive partition VALUES as literal strings
    (inference would re-type '01' -> 1 and bake it in on rewrite).
    Returns (df, partition_cols)."""
    pcols = _hive_partition_cols(path)
    if not pcols:
        return spark.read.format(fmt).load(path), []
    prev_inf = spark.conf.get(
        "spark.sql.sources.partitionColumnTypeInference.enabled"
    )
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    try:
        return spark.read.format(fmt).load(path), pcols
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled", prev_inf
        )


def _footer_row_count(df, path: str, fmt: str) -> int:
    """Row count from parquet footer metadata (no data scan); falls
    back to a count() for other formats."""
    import glob
    import os

    if fmt == "parquet":
        import pyarrow.parquet as pq

        files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if files:
            return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return df.count()


def _swap_in(out, path: str, fmt: str, pcols: Sequence[str]) -> int:
    """Write ``out`` to a sibling tmp dir, atomically swap it in (with
    the crash-recoverable '._compact_old' protocol), return the new
    data-file count."""
    import glob
    import os
    import shutil

    tmp = path.rstrip("/") + "._compact_tmp"
    bak = path.rstrip("/") + "._compact_old"
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
    _restore_crashed_swap(path)
    df, pcols = _read_preserving_partitions(spark, path, fmt)
    n_rows = _footer_row_count(df, path, fmt)
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
    return _swap_in(out, path, fmt, pcols)


def zorder_key(cols: Sequence, mins: Sequence[float], maxs: Sequence[float], bits: int = 8):
    """Z-order (Morton) key over N numeric columns as pure Column math:
    each value is min-max normalized to ``bits`` bits using the GLOBAL
    min/max (computed once as a 1-row aggregate and broadcast — never a
    rank window, which would funnel the dataset through one partition),
    then the bit patterns interleave. Range-partitioning + sorting on
    this key gives every output file a small hyper-rectangle of the key
    space, so min/max file stats prune on EVERY participating column —
    linear cluster_by prunes only its leading column.

    ``cols`` are Columns (or names), ``mins``/``maxs`` the matching
    global bounds. Returns a bigint Column; N * bits must stay < 63."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits >= 63:
        raise ValueError(f"zorder_key: {n} cols x {bits} bits overflows bigint")
    quant = []
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        scaled = (
            F.lit(0).cast("bigint")
            if span == 0
            else F.least(
                F.lit((1 << bits) - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (col.cast("double") - F.lit(float(lo)))
                        / F.lit(span)
                        * F.lit(float(1 << bits))
                    ),
                ),
            ).cast("bigint")
        )
        # a NULL in ONE column must not null the whole Morton key
        # (that would funnel every partially-NULL row into a single
        # range partition and lose min/max pruning for them): NULL
        # buckets as 0, so the row still interleaves on its non-null
        # dimensions
        quant.append(F.coalesce(scaled, F.lit(0).cast("bigint")))
    key = F.lit(0).cast("bigint")
    for bit in range(bits):
        for i, q in enumerate(quant):
            key = key + F.shiftleft(
                F.shiftrightunsigned(q, bit).bitwiseAND(F.lit(1)),
                bit * n + i,
            ).cast("bigint")
    return key


def compact_dataset_zorder(
    spark,
    path: str,
    zorder_by: Sequence[str],
    target_records_per_file: int = 1_000_000,
    bits: int = 8,
    fmt: str = "parquet",
) -> int:
    """compact_dataset's multi-dimensional sibling: rewrite the dataset
    range-clustered on the interleaved Z-order key of ``zorder_by`` so
    file-level min/max stats prune for predicates on ANY of those
    columns (a linear cluster_by serves only its first column — the
    standard reason lakehouses Z-order their two or three hottest
    filter columns).

    Plan: one 1-row global min/max aggregate (broadcast back via a
    cross join — the engine's standard scalar-aggregate shape), a
    map-side Morton-key projection, then the same
    repartitionByRange + sortWithinPartitions + atomic-swap write as
    compact_dataset (shared helpers: crash-recovery preamble,
    footer-metadata row count, hive layout/value preservation with
    the z-clustering applied WITHIN partitions). Returns the new file
    count."""
    from pyspark.sql import functions as F

    _restore_crashed_swap(path)
    df, pcols = _read_preserving_partitions(spark, path, fmt)
    n_rows = _footer_row_count(df, path, fmt)
    n_files = max(1, -(-n_rows // target_records_per_file))
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in zorder_by],
        *[F.max(c).alias(f"_hi_{c}") for c in zorder_by],
    ).first()
    mins = [bounds[f"_lo_{c}"] for c in zorder_by]
    maxs = [bounds[f"_hi_{c}"] for c in zorder_by]
    if n_rows == 0 or any(v is None for v in mins + maxs):
        # empty dataset or all-NULL z column: nothing to cluster on —
        # degrade to a plain compaction instead of a TypeError
        out = df.repartition(n_files, *pcols) if pcols else df.repartition(n_files)
        return _swap_in(out, path, fmt, pcols)
    keyed = df.withColumn("_zkey", zorder_key(list(zorder_by), mins, maxs, bits))
    out = (
        keyed.repartitionByRange(n_files, *pcols, "_zkey")
        .sortWithinPartitions(*pcols, "_zkey")
        .drop("_zkey")
    )
    return _swap_in(out, path, fmt, pcols)


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
