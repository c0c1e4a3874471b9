"""Vector-storage operator tests: int8 quantization error bounds and
Lloyd-iteration convergence (the properties the oracle-parity check
cannot express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from env_data_pipeline_spark.catalog import table
from env_data_pipeline_spark.extensions import similarity as X


def _pts(spark, sf_dir):
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def test_int8_quantization_error_small(spark, sf_dir):
    """Symmetric int8 on 64-dim vectors: worst-case per-component
    error is scale/2, so the relative L2 error must stay well under
    1% on this data — the lossless-enough storage-format claim."""
    emb = _pts(spark, sf_dir)
    q = X.int8_quantize_cols(F.col("v"))
    stats = emb.select(
        F.max(q["rel_err"]).alias("mx"), F.min(q["rel_err"]).alias("mn")
    ).collect()[0]
    assert 0.0 <= stats["mn"] <= stats["mx"] < 0.01


def test_int8_codes_in_range(spark, sf_dir):
    """Every emitted code fits int8: |floor(x/scale + .5)| <= 127."""
    emb = _pts(spark, sf_dir)
    absmax = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = absmax / F.lit(127.0)
    worst = F.aggregate(
        F.col("v"),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(F.floor(x / scale + F.lit(0.5)))),
    )
    top = emb.select(F.max(worst).alias("w")).collect()[0]["w"]
    assert top <= 127.0


def test_kmeans_inertia_decreases(spark, sf_dir):
    """One more Lloyd iteration must not increase total inertia —
    the convergence property of the alternating minimization (each
    step re-assigns to the nearest centroid, then re-centers)."""
    pts = _pts(spark, sf_dir)
    k, step = 4, 30
    init = pts.filter(
        (F.col("vec_id") % step == 0) & (F.col("vec_id") < k * step)
    ).select(
        (F.col("vec_id") / step).cast("int").alias("cluster_id"),
        F.col("v").alias("c"),
    )

    def inertia(iters: int) -> float:
        a = X.kmeans_lloyd(pts, init, iters=iters)
        return a.agg(F.sum("dist2").alias("s")).collect()[0]["s"]

    i1, i2 = inertia(1), inertia(2)
    assert i2 <= i1 * (1.0 + 1e-9), (i1, i2)


def test_kmeans_assignment_is_total_partition(spark, sf_dir):
    """Every vector lands in exactly one cluster."""
    pts = _pts(spark, sf_dir)
    k, step = 4, 30
    init = pts.filter(
        (F.col("vec_id") % step == 0) & (F.col("vec_id") < k * step)
    ).select(
        (F.col("vec_id") / step).cast("int").alias("cluster_id"),
        F.col("v").alias("c"),
    )
    a = X.kmeans_lloyd(pts, init, iters=2)
    assert a.count() == pts.count()
    assert a.select("vec_id").distinct().count() == pts.count()
