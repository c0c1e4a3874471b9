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

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from env_data_pipeline_spark.extensions import similarity as X
from env_data_pipeline_spark.streaming.replay import (
    replay_foreachbatch,
    write_shards,
)

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
    write_shards(pts, delta_dir, BATCH_SHARDS, "vec_id")

    def _code_batch(batch_df: DataFrame, batch_id: int) -> None:
        # append-only: new vectors never touch previously-coded rows
        X.pq_assign(batch_df, codebook, m_subspaces, dim_per_sub, quant).drop(
            "dist_u"
        ).write.mode("append").parquet(codes_dir)

    replay_foreachbatch(
        spark, delta_dir, ckpt_dir, BATCH_SHARDS, _code_batch, "streaming PQ coding"
    )
    return spark.read.parquet(codes_dir).localCheckpoint(eager=True)
