"""Streaming PQ-index maintenance (O6 background execution x X3
vector storage): a foreachBatch sink that codes each micro-batch of
newly-arrived vectors against the frozen codebook and appends them to
a persistent (vec_id, cell-free) code table — how a 100 TB vector
store keeps its ANN index fresh without rebuilds.

Same proof shape as the incremental-aggregate and SCD2 refreshers:
the vector set replays as real micro-batches (maxFilesPerTrigger=1,
multi-batch guard), the code table persists as parquet between
batches, and the final table must equal the one-shot batch
pq_codes over all vectors — which holds because coding is per-row
(embarrassingly incremental) and the codebook is frozen. The
interesting scale property is the inverse: RE-coding is only ever
needed when the CODEBOOK changes, and then it is a full-scan batch
job — this module makes the cheap direction (new vectors) concrete.

Per batch: one broadcast codebook join + one partial-aggregated
argmin over the batch's rows only — O(|batch| * M * K) work, zero
touches of previously-coded vectors."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from env_data_pipeline_spark.extensions import similarity as X

BATCH_SHARDS = 3


def streaming_pq_code_refresh(
    spark: SparkSession,
    pts: DataFrame,
    codebook: DataFrame,
    m_subspaces: int,
    dim_per_sub: int,
    quant: float = 1e6,
) -> DataFrame:
    """Replay ``pts`` (vec_id, v) as BATCH_SHARDS micro-batches; each
    batch is PQ-coded against the broadcast ``codebook`` and appended
    to the persistent code table. Returns the final (vec_id, m, code)
    table."""
    work = tempfile.mkdtemp(prefix="stream_pqcodes_")
    try:
        return _run(spark, work, pts, codebook, m_subspaces, dim_per_sub, quant)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _run(
    spark: SparkSession,
    work: str,
    pts: DataFrame,
    codebook: DataFrame,
    m_subspaces: int,
    dim_per_sub: int,
    quant: float,
) -> DataFrame:
    delta_dir = os.path.join(work, "deltas")
    ckpt_dir = os.path.join(work, "ckpt")
    codes_dir = os.path.join(work, "codes")
    os.makedirs(delta_dir)

    for i in range(BATCH_SHARDS):
        shard_tmp = os.path.join(delta_dir, f"_build_{i}")
        pts.filter(F.col("vec_id") % BATCH_SHARDS == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(shard_tmp)
        (part,) = glob.glob(os.path.join(shard_tmp, "part-*.parquet"))
        os.rename(part, os.path.join(delta_dir, f"batch_{i}.parquet"))
        shutil.rmtree(shard_tmp)

    schema = spark.read.parquet(os.path.join(delta_dir, "batch_0.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(delta_dir)
    )

    def _code_batch(batch_df: DataFrame, batch_id: int) -> None:
        # append-only: new vectors never touch previously-coded rows
        X.pq_assign(batch_df, codebook, m_subspaces, dim_per_sub, quant).drop(
            "dist_u"
        ).write.mode("append").parquet(codes_dir)

    q = (
        stream.writeStream.foreachBatch(_code_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    lp = q.lastProgress
    q.stop()
    q.awaitTermination(60)
    if lp is None:
        raise RuntimeError("streaming PQ coding processed no batches")
    if not isinstance(lp, dict):
        import json

        lp = json.loads(lp.json)
    if lp["batchId"] < BATCH_SHARDS - 1:
        raise RuntimeError(
            f"streaming PQ coding collapsed to {lp['batchId'] + 1} "
            f"batch(es); expected {BATCH_SHARDS}"
        )
    return spark.read.parquet(codes_dir).localCheckpoint(eager=True)
