"""Builder-generated scale-probe tier: one data decade BEYOND the
largest shipped testdata (VERDICT r5 item 8).

The shipped tiers prove sublinearity across sf0.01 -> sf0.1 (10x
documents, 4x embeddings). This module derives a third point — a
deterministic 10x replication of sf0.1's documents/embeddings under
``.fixtures/`` (testdata itself is read-only) — so the bench scaling
block carries a log-log slope fit over a 100x span instead of a
single ratio.

Honest-scaling rules (the point is timing a BIGGER corpus, not a
degenerate one):

- every replica's text is word-tagged with its replica number, so the
  within-replica duplicate topology (what `_aug_docs` plants, what
  MinHash banding must find) is IDENTICAL per replica while
  cross-replica docs share no shingles — a naive copy would make
  every document a 10-way near-dup family and the LSH pair output
  quadratic in replicas, timing an artifact instead of the corpus;
- every replica's vectors get a small deterministic per-component
  jitter, so IVF cells fill 10x (linear work growth) without exact
  distance ties; replica ids sit far above the k-means seed window
  (`vec_id < K*_INIT_STEP`), so training still initializes from the
  original rows only;
- replica id strides are multiples of the planted-duplicate modulus
  (50) and clear of the EXACT/NEAR copy offsets, so `_aug_docs`
  replants the same structure in every replica without collisions.

Replica 0 is the untouched original, so the probe tier strictly
contains sf0.1. Generation is cached behind a completion marker and
rebuilt only when this module's generation tag changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# bump when the generation recipe changes; part of the cache dir name
_GEN_TAG = "r7a"
DOC_MULT = 10
EMB_MULT = 10
_DOC_STRIDE = 50_000_000  # multiple of 50, > NEAR_COPY_OFFSET margin
_EMB_STRIDE = 1_000_000


def scale_tier_dir(base_dir: str) -> str:
    base_tag = os.path.basename(base_dir.rstrip("/"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(
        root, ".fixtures", f"scaleprobe-{base_tag}-x{DOC_MULT}-{_GEN_TAG}"
    )


def ensure_scale_tier(spark: SparkSession, base_dir: str) -> str:
    """Materialize (or reuse) the probe tier derived from ``base_dir``;
    returns its directory, laid out like a testdata sf dir."""
    out = scale_tier_dir(base_dir)
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    reps = spark.range(DOC_MULT).select(F.col("id").cast("int").alias("rep"))
    tagged = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("~"), F.col("rep").cast("string")),
        ),
        " ",
    )
    scaled_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep").cast("bigint") * _DOC_STRIDE).alias(
                "doc_id"
            ),
            F.when(F.col("rep") == 0, F.col("text")).otherwise(tagged).alias("text"),
            "lang",
            "source",
            F.length(
                F.when(F.col("rep") == 0, F.col("text")).otherwise(tagged)
            ).alias("n_chars"),
        )
    )
    scaled_docs.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    ereps = spark.range(EMB_MULT).select(F.col("id").cast("int").alias("rep"))
    # deterministic jitter: a fixed-point sin of (component index,
    # vec_id, replica) — replica 0 stays exact
    jittered = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x
            + F.when(F.col("rep") == 0, F.lit(0.0)).otherwise(
                F.sin((F.col("vec_id") * 64 + i.cast("bigint")) * (F.col("rep") + 3))
                * 0.05
            )
        ).cast("float"),
    )
    scaled_emb = (
        emb.crossJoin(F.broadcast(ereps))
        .select(
            (F.col("vec_id") + F.col("rep").cast("bigint") * _EMB_STRIDE).alias(
                "vec_id"
            ),
            jittered.alias("embedding"),
            "label",
        )
    )
    scaled_emb.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )

    with open(marker, "w") as fh:
        fh.write(f"doc_mult={DOC_MULT} emb_mult={EMB_MULT} tag={_GEN_TAG}\n")
    return out
