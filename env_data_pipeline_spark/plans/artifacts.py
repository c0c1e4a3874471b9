"""Persisted trained-artifact cache, shared by every query that
serves from a deterministic trained index instead of retraining per
invocation (IVF centroids / inverted lists / PQ codebooks in
plans/vectorops.py; quality-classifier weights in
plans/qualityclf.py).

At 100 TB a trained index/model is a stored artifact consumed by
every query batch — timing (or re-running) training per serve
measures the wrong thing. The cache key is the SOURCE file's
path+mtime plus the caller's training-parameter string, so a grown
or regenerated corpus — or any hyperparameter change — maps to a new
slot and a stale index can never serve (review finding, r7)."""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

from pyspark.sql.functions import col as F_col
from pyspark.sql.types import StructType


def artifact_path(
    sf_dir: str, src_table: str, name: str, params: str = ""
) -> str:
    """Cache location for a trained artifact: md5 of the source
    table file's path+mtime and the training-parameter string."""
    src = os.path.join(sf_dir, f"{src_table}.parquet")
    key = f"{os.path.abspath(src)}:{os.path.getmtime(src)}:{params}"
    h = hashlib.md5(key.encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), "edps_index_artifacts", h, name)


def persisted_artifact(
    spark,
    sf_dir,
    src_table,
    name,
    build,
    params="",
    partition_by=None,
):
    """Read the named artifact for this corpus from the cache,
    building and persisting it on first use. The write is
    tmpdir+rename so concurrent first builders (driver, pytest, bench
    all share /tmp) race safely — the loser discards its copy of the
    identical deterministic artifact. ``partition_by`` writes the
    artifact hive-partitioned on those columns (the IVF inverted
    lists partition by cell so the serving join dynamically prunes to
    the probed cells' files)."""
    d = artifact_path(sf_dir, src_table, name, params)
    if not os.path.exists(d):
        tmp = f"{d}.tmp.{os.getpid()}"
        # a build/write failure must not orphan a corpus-sized partial
        # tmp dir in /tmp (ADVICE r11) — clean up before re-raising
        try:
            built = build()
            # schema sidecar (r12): every serving query otherwise pays
            # a one-task footer-inference Spark job PER ARTIFACT READ
            # (~50-90 ms of driver latency each; the IVF+PQ serve reads
            # three artifacts per invocation). build() is lazy, so its
            # schema costs nothing here; the reader below passes it
            # explicitly and skips the inference job entirely.
            os.makedirs(os.path.dirname(tmp), exist_ok=True)
            with open(f"{tmp}.schema", "w") as fh:
                fh.write(built.schema.json())
            if partition_by:
                # corpus-sized partitioned artifacts (the IVF inverted
                # lists) build in PARALLEL: repartition on the partition
                # columns co-locates each partition value in one task (one
                # file per value), where coalesce(1) would funnel the
                # whole corpus through a single writer task
                w = built.repartition(*[F_col(c) for c in partition_by]).write
                w = w.mode("overwrite").partitionBy(*partition_by)
            else:
                # K-row index/model artifacts: one file is the right shape
                w = built.coalesce(1).write.mode("overwrite")
            w.parquet(tmp)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            os.unlink(f"{tmp}.schema") if os.path.exists(f"{tmp}.schema") else None
            raise
        try:
            os.rename(tmp, d)
            os.replace(f"{tmp}.schema", f"{d}.schema")
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if os.path.exists(f"{tmp}.schema"):
                os.unlink(f"{tmp}.schema")
    sidecar = f"{d}.schema"
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            schema = StructType.fromJson(json.load(fh))
        return spark.read.schema(schema).parquet(d)
    # cache dirs written before the sidecar existed: infer as before
    return spark.read.parquet(d)
