"""Streaming SCD2 dimension maintenance (O6 background execution x
X7 history algebra): a foreachBatch sink that applies each
micro-batch of dimension updates to a persistent SCD2 history table
— the streaming form of nightly dimension maintenance, sibling of
incremental_refresh.py's standing aggregate.

Mechanics proven, not claimed: the update set splits into
BATCH_SHARDS delta files replayed with maxFilesPerTrigger=1 (the
multi-batch guard raises if the replay ever collapses), the history
persists as parquet between batches (ping-pong A/B dirs), and the
final table must hash-equal the one-shot batch SCD2 result (the
DuckDB oracle) — which holds only if closing/opening validity
intervals composes correctly across batch boundaries.

Scale posture: each batch is ONE key join of the history against the
batch's updates plus a map-side fan-out (operators/incremental.py::
scd2_apply_history) — O(|hist| + |batch|) per batch, bucket-elidable
on the dimension key. The same at-least-once foreachBatch caveat as
incremental_refresh.py applies (documented there); here redelivery of
an already-applied batch is additionally a NO-OP by construction,
because a re-delivered update matches the now-current attributes and
forks no history (pinned by tests/test_incremental.py)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from env_data_pipeline_spark.operators import incremental as INC

BATCH_SHARDS = 2


def streaming_scd2_refresh(
    spark: SparkSession,
    sf_dir: str,
    updates: DataFrame,
    dim: DataFrame,
    key: str,
    attrs: list[str],
    base_date: str,
    batch_date: str,
) -> DataFrame:
    """Replay ``updates`` as BATCH_SHARDS micro-batches (split by key
    parity, so batches touch disjoint keys); foreachBatch applies each
    to the persistent history. Returns the final history table."""
    work = tempfile.mkdtemp(prefix="stream_scd2_")
    try:
        return _run_refresh(
            spark, work, updates, dim, key, attrs, base_date, batch_date
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _run_refresh(
    spark: SparkSession,
    work: str,
    updates: DataFrame,
    dim: DataFrame,
    key: str,
    attrs: list[str],
    base_date: str,
    batch_date: str,
) -> DataFrame:
    delta_dir = os.path.join(work, "deltas")
    ckpt_dir = os.path.join(work, "ckpt")
    state_dirs = [os.path.join(work, "state_a"), os.path.join(work, "state_b")]
    os.makedirs(delta_dir)

    for i in range(BATCH_SHARDS):
        shard_tmp = os.path.join(delta_dir, f"_build_{i}")
        updates.filter(F.col(key) % BATCH_SHARDS == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(shard_tmp)
        (part,) = glob.glob(os.path.join(shard_tmp, "part-*.parquet"))
        os.rename(part, os.path.join(delta_dir, f"batch_{i}.parquet"))
        shutil.rmtree(shard_tmp)

    # seed the persistent history with the trivial expansion of the
    # current-only snapshot
    INC.scd2_init(dim, key, attrs, base_date).write.mode("overwrite").parquet(
        state_dirs[1]
    )

    schema = spark.read.parquet(os.path.join(delta_dir, "batch_0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(delta_dir)
    )

    live: list[str] = []

    def _apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = state_dirs[(batch_id + 1) % 2]
        nxt = state_dirs[batch_id % 2]
        hist = batch_df.sparkSession.read.parquet(cur)
        merged = INC.scd2_apply_history(hist, batch_df, key, attrs, batch_date)
        merged.write.mode("overwrite").parquet(nxt)
        live.append(nxt)

    q = (
        stream.writeStream.foreachBatch(_apply_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    lp = q.lastProgress
    q.stop()
    q.awaitTermination(60)
    if lp is None:
        raise RuntimeError("streaming SCD2 replay processed no batches")
    if not isinstance(lp, dict):
        import json

        lp = json.loads(lp.json)
    last_batch = lp["batchId"]
    if last_batch < BATCH_SHARDS - 1:
        raise RuntimeError(
            f"streaming SCD2 replay collapsed to {last_batch + 1} "
            f"batch(es); expected {BATCH_SHARDS}"
        )

    # detach the result from the about-to-be-removed temp dir WITHOUT
    # round-tripping the (dimension-sized) history through the driver:
    # localCheckpoint materializes the partitions on the executors
    return spark.read.parquet(live[-1]).localCheckpoint(eager=True)
