"""Multimodal column operators (X5, SURVEY.md §2.11).

Image/audio/video payloads are opaque BinaryType columns with typed
metadata structs — exactly the pattern the reference uses for GeoTIFF
blobs (S8, landfire_container.py:308-320). The decode / feature-
extract step runs as an Arrow-batched mapInPandas kernel; the actual
codec is STUBBED (no image/audio libs in this container) behind a
deterministic byte-statistics fake, so the Spark-side plumbing —
schema, batching, partitioning — is real and tested while the codec
is swappable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_AVAILABLE = False  # flip when a real codec (PIL/torchaudio) ships

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes long, "
    "checksum string, brightness double, feature_dim int"
)


def media_assets(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media-asset table from documents: the
    UTF-8 text bytes stand in for an encoded payload; media_type cycles
    image/audio/video; width/height metadata for images."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
            F.lit("stub/v1").alias("codec"),
        ).alias("meta"),
    )


def make_decode_batch(codec=None):
    """Build the decode kernel with an INJECTABLE codec.

    ``codec`` is ``callable(payload: bytes, media_type: str) -> dict``
    returning keys ``checksum/brightness/feature_dim`` — the seam where
    a real decoder (PIL / torchaudio / pyav) plugs in. ``None`` selects
    the deterministic byte-statistics stand-in (no media libs in this
    container; ``DECODE_AVAILABLE`` documents that). Either way the
    Spark-side contract — mapInPandas signature, Arrow batch shape,
    output schema — is identical, and the swap itself is exercised by
    tests/test_extensions.py with a fake injected codec.

    Nested function so cloudpickle serializes the kernel (and any
    injected codec closure) by value — executors must not need this
    repo on their PYTHONPATH (the driver contract imports
    __spark_entry__.py from an arbitrary cwd)."""
    codec_fn = codec

    def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as pd

        def byte_stats(payload: bytes, media_type: str) -> dict:
            return {
                "checksum": hashlib.md5(payload).hexdigest(),
                # deterministic fake 'brightness': mean byte value
                "brightness": round(sum(payload) / len(payload), 4)
                if len(payload)
                else 0.0,
                "feature_dim": 16,
            }

        decode = codec_fn if codec_fn is not None else byte_stats
        for pdf in it:
            feats = [
                decode(b, mt) for b, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "checksum": [f["checksum"] for f in feats],
                    "brightness": [f["brightness"] for f in feats],
                    "feature_dim": [f["feature_dim"] for f in feats],
                }
            )

    return decode_batch


decode_batch = make_decode_batch()


def extract_features(assets: DataFrame, codec=None) -> DataFrame:
    """The decode/feature pipeline: binary in, typed features out, one
    Arrow batch at a time (no per-row Python loop outside the batch).
    Pass ``codec`` to swap in a real decoder (see make_decode_batch)."""
    kernel = decode_batch if codec is None else make_decode_batch(codec)
    return assets.mapInPandas(kernel, schema=FEATURE_SCHEMA)
