"""Shared micro-batch replay scaffolding for the foreachBatch
maintenance modules (incremental_refresh, scd2_refresh,
vector_index_refresh): shard a deterministic input into single-file
deltas, replay them one file per trigger, and guard that the replay
REALLY ran multi-batch — if availableNow ever stopped honoring
maxFilesPerTrigger and collapsed to one batch, the cross-batch merge
path would be untested while the result stayed green."""

from __future__ import annotations

import glob
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_shards(df: DataFrame, out_dir: str, n_shards: int, key: str) -> None:
    """Materialize ``df`` as ``n_shards`` single-file parquet deltas
    (split by ``key`` % n_shards), named so the file source lists them
    deterministically (lexicographic order = shard order)."""
    for i in range(n_shards):
        shard_tmp = os.path.join(out_dir, f"_build_{i}")
        df.filter(F.col(key) % n_shards == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(shard_tmp)
        (part,) = glob.glob(os.path.join(shard_tmp, "part-*.parquet"))
        os.rename(part, os.path.join(out_dir, f"batch_{i}.parquet"))
        shutil.rmtree(shard_tmp)


def replay_foreachbatch(
    spark: SparkSession,
    delta_dir: str,
    ckpt_dir: str,
    n_shards: int,
    apply_fn: Callable[[DataFrame, int], None],
    what: str,
) -> None:
    """Stream ``delta_dir`` one file per trigger through ``apply_fn``
    and raise unless exactly ``n_shards`` micro-batches ran."""
    schema = spark.read.parquet(os.path.join(delta_dir, "batch_0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(delta_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_fn)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    lp = q.lastProgress
    q.stop()
    q.awaitTermination(60)
    if lp is None:
        raise RuntimeError(f"{what} replay processed no batches")
    if not isinstance(lp, dict):  # older API returns an object
        import json

        lp = json.loads(lp.json)
    if lp["batchId"] < n_shards - 1:
        raise RuntimeError(
            f"{what} replay collapsed to {lp['batchId'] + 1} "
            f"batch(es); expected {n_shards}"
        )
