"""Builder-generated scale-probe tiers: data decades BEYOND the
largest shipped testdata (VERDICT r5 item 8; r8 item 2 pushed them a
decade further).

The shipped tiers prove sublinearity across sf0.01 -> sf0.1 (10x
documents, 4x embeddings). This module derives further points — a
deterministic ``mult``-fold replication of sf0.1's tables under
``.fixtures/`` (testdata itself is read-only) — so the bench scaling
block carries log-log slope fits over 3 decades for the document/
embedding families (x10 AND x100 tiers) and an sf1-equivalent x10
tier for the lineitem/events-backed headliners (triangle counting,
interval self-join).

Honest-scaling rules (the point is timing a BIGGER corpus, not a
degenerate one):

- every replica's text is word-tagged with its replica number, so the
  within-replica duplicate topology (what `_aug_docs` plants, what
  MinHash banding must find) is IDENTICAL per replica while
  cross-replica docs share no shingles — a naive copy would make
  every document an N-way near-dup family and the LSH pair output
  quadratic in replicas, timing an artifact instead of the corpus;
- every replica's vectors get a small deterministic per-component
  jitter, so IVF cells fill N-fold (linear work growth) without exact
  distance ties; replica ids sit far above the k-means seed window
  (`vec_id < K*_INIT_STEP`), so training still initializes from the
  original rows only;
- lineitem replicas offset ORDER, PART and SUPPLIER keys, so the
  co-purchase graph becomes N disjoint copies — every stage of the
  triangle pipeline (basket join, edge build, wedge closure) grows
  linearly, exactly as a real SF-up grows the part universe. Events
  replicas offset user/event ids: disjoint user populations keep the
  per-bucket pair work linear;
- replica id strides are multiples of the planted-duplicate modulus
  (50) and clear of the EXACT/NEAR copy offsets, so `_aug_docs`
  replants the same structure in every replica without collisions.

Replica 0 is the untouched original, so every probe tier strictly
contains its base. Generation is cached behind per-table completion
markers and rebuilt only when this module's generation tag changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# bump when the generation recipe changes; part of the cache dir name
_GEN_TAG = "r9a"
DOC_MULT = 10
EMB_MULT = 10
DEEP_MULT = 100  # the 3rd-decade documents/embeddings tier
_DOC_STRIDE = 50_000_000  # multiple of 50, > NEAR_COPY_OFFSET margin
_EMB_STRIDE = 1_000_000
_ORD_STRIDE = 100_000_000
_PART_STRIDE = 10_000_000
_SUPP_STRIDE = 1_000_000
_EVT_STRIDE = 1_000_000_000
_USER_STRIDE = 10_000_000

# default table set; lineitem/events only materialize when asked
DEFAULT_TABLES = ("documents", "embeddings")


def scale_tier_dir(base_dir: str, mult: int = DOC_MULT) -> str:
    base_tag = os.path.basename(base_dir.rstrip("/"))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(
        root, ".fixtures", f"scaleprobe-{base_tag}-x{mult}-{_GEN_TAG}"
    )


def _reps(spark: SparkSession, mult: int):
    return spark.range(mult).select(F.col("id").cast("int").alias("rep"))


def _gen_documents(spark, base_dir, out, mult):
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    tagged = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("~"), F.col("rep").cast("string")),
        ),
        " ",
    )
    (
        docs.crossJoin(F.broadcast(_reps(spark, mult)))
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
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )


def _gen_embeddings(spark, base_dir, out, mult):
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
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
    (
        emb.crossJoin(F.broadcast(_reps(spark, mult)))
        .select(
            (F.col("vec_id") + F.col("rep").cast("bigint") * _EMB_STRIDE).alias(
                "vec_id"
            ),
            jittered.alias("embedding"),
            "label",
        )
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )


def _gen_lineitem(spark, base_dir, out, mult):
    li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))
    rep = F.col("rep").cast("bigint")
    shifted = [
        (F.col("l_orderkey") + rep * _ORD_STRIDE).alias("l_orderkey"),
        (F.col("l_partkey") + rep * _PART_STRIDE).alias("l_partkey"),
        (F.col("l_suppkey") + rep * _SUPP_STRIDE).alias("l_suppkey"),
    ] + [
        F.col(c)
        for c in li.columns
        if c not in ("l_orderkey", "l_partkey", "l_suppkey")
    ]
    (
        li.crossJoin(F.broadcast(_reps(spark, mult)))
        .select(*shifted)
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )


def _gen_events(spark, base_dir, out, mult):
    ev = spark.read.parquet(os.path.join(base_dir, "events.parquet"))
    rep = F.col("rep").cast("bigint")
    shifted = [
        (F.col("event_id") + rep * _EVT_STRIDE).alias("event_id"),
        (F.col("user_id") + rep * _USER_STRIDE).alias("user_id"),
    ] + [
        F.col(c) for c in ev.columns if c not in ("event_id", "user_id")
    ]
    (
        ev.crossJoin(F.broadcast(_reps(spark, mult)))
        .select(*shifted)
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )


_GENERATORS = {
    "documents": _gen_documents,
    "embeddings": _gen_embeddings,
    "lineitem": _gen_lineitem,
    "events": _gen_events,
}


def ensure_scale_tier(
    spark: SparkSession,
    base_dir: str,
    mult: int = DOC_MULT,
    tables: tuple[str, ...] = DEFAULT_TABLES,
) -> str:
    """Materialize (or reuse) the ``mult``-fold probe tier derived
    from ``base_dir``; returns its directory, laid out like a
    testdata sf dir. Tables are generated lazily table-by-table (a
    later call can add lineitem/events to an existing tier without
    regenerating documents)."""
    out = scale_tier_dir(base_dir, mult)
    os.makedirs(out, exist_ok=True)
    for t in tables:
        marker = os.path.join(out, f"_COMPLETE_{t}")
        if os.path.exists(marker):
            continue
        _GENERATORS[t](spark, base_dir, out, mult)
        with open(marker, "w") as fh:
            fh.write(f"mult={mult} tag={_GEN_TAG}\n")
    return out
