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


def _make_decode_batch():
    """Build the decode kernel as a NESTED function so cloudpickle
    serializes it by value — executors must not need this repo on
    their PYTHONPATH (the driver contract imports __spark_entry__.py
    from an arbitrary cwd)."""
    decode_available = DECODE_AVAILABLE

    def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """mapInPandas kernel: per-Arrow-batch 'decode' producing byte
        statistics. A real decoder would replace the body; the
        signature, batch shape and output schema stay identical."""
        import hashlib

        import pandas as pd

        for pdf in it:
            if decode_available:  # pragma: no cover - no codec in this env
                raise NotImplementedError("real codec path not wired")
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len),
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    # deterministic fake 'brightness': mean byte value
                    "brightness": payloads.map(
                        lambda b: round(sum(b) / len(b), 4) if len(b) else 0.0
                    ),
                    "feature_dim": payloads.map(lambda b: 16),
                }
            )

    return decode_batch


decode_batch = _make_decode_batch()


def extract_features(assets: DataFrame) -> DataFrame:
    """The decode/feature pipeline: binary in, typed features out, one
    Arrow batch at a time (no per-row Python)."""
    return assets.mapInPandas(decode_batch, schema=FEATURE_SCHEMA)
