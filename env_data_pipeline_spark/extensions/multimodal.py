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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _b64(col: Column) -> Column:
    # Spark's base64 emits MIME-chunked text (CRLF every 76 chars);
    # strip to the standard unchunked form b64encode().decode() produces
    return F.regexp_replace(F.base64(col), "\r\n", "")


def sanitize_binary(col: Column, dt: T.DataType) -> Column:
    """RECURSIVE binary->base64 sanitize over an arbitrarily nested
    type — the exact semantics of the reference's sanitize_binary_data
    (landfire_container.py:308-320 / topography_container.py:180-192),
    which walks dicts/lists and b64-encodes every bytes leaf, leaving
    other values untouched. Schema recursion happens at PLAN TIME
    (driver-side, over the static schema), so the result is a pure
    Column expression tree — whole-stage-codegen'd, zero Python at row
    time, any nesting depth."""
    if isinstance(dt, T.BinaryType):
        return _b64(col)
    if isinstance(dt, T.StructType):
        rebuilt = F.struct(
            *[
                sanitize_binary(col.getField(f.name), f.dataType).alias(f.name)
                for f in dt.fields
            ]
        )
        # F.struct over a NULL struct's fields yields a struct of
        # nulls; preserve the null itself
        return F.when(col.isNotNull(), rebuilt)
    if isinstance(dt, T.ArrayType):
        elem = dt.elementType
        return F.transform(col, lambda x: sanitize_binary(x, elem))
    if isinstance(dt, T.MapType):
        val = dt.valueType
        # like the reference: keys (JSON object keys) pass through,
        # values are sanitized
        return F.transform_values(col, lambda _k, v: sanitize_binary(v, val))
    return col


def sanitize_binary_columns(df: DataFrame) -> DataFrame:
    """Apply sanitize_binary to every column: the JSON-boundary export
    shape — no BinaryType survives anywhere in the output schema."""
    return df.select(
        *[
            sanitize_binary(F.col(f.name), f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
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
        import math

        import pandas as pd

        def byte_stats(payload: bytes, media_type: str) -> dict:
            # mean byte value rounded HALF-UP to 4 decimals (the
            # repo's cross-engine rounding discipline): Python's
            # round() is half-EVEN, and payload lengths with only
            # 2s and 5s in their factorization (512, 320, ...) make
            # sum/len an exact 5-decimal tie where the two rules
            # disagree — observed at doc 285 (93.90625)
            mean = sum(payload) / len(payload) if len(payload) else 0.0
            return {
                "checksum": hashlib.md5(payload).hexdigest(),
                "brightness": math.floor(mean * 10000 + 0.5) / 10000,
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


# --------------------------------------------------------------------------
# Perceptual hash: 32x32 integer-DCT pHash (real kernel, numpy only)
# --------------------------------------------------------------------------

PHASH_SLICES = 16  # 64 bits -> 16 hex nibbles
PHASH_IMG = 32  # thumbnail side: payload bytes tiled into 32x32 gray
PHASH_LOWFREQ = 8  # keep the top-left 8x8 DCT block = 64 bits
PHASH_DCT_SCALE = 1024  # integer-quantized cosine basis (codec-style)

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)


def dct_basis() -> list[list[int]]:
    """The integer-quantized DCT-II basis both engines share:
    B[u][x] = round(1024 * cos(pi*(2x+1)*u/64)), u<8, x<32. Integer
    quantization (as real codecs do) makes the whole hash exact
    integer math, so a SQL oracle can replay it bit-for-bit. Row sums
    for u >= 1 are exactly 0 even after rounding, which makes the AC
    coefficients — hence 63 of the 64 hash bits — EXACTLY invariant
    under a uniform brightness shift (the signature pHash property)."""
    import math

    return [
        [
            round(
                PHASH_DCT_SCALE
                * math.cos(math.pi * (2 * x + 1) * u / (2 * PHASH_IMG))
            )
            for x in range(PHASH_IMG)
        ]
        for u in range(PHASH_LOWFREQ)
    ]


def dct_phash(payload: bytes, gain: int = 0) -> str:
    """Real pHash over an opaque payload: tile the bytes into a 32x32
    grayscale thumbnail (truncate past 1024, cycle shorter payloads),
    add the per-asset brightness ``gain``, 2-D integer DCT, keep the
    8x8 low-frequency block, threshold each coefficient against the
    median of the 63 AC coefficients -> 64 bits -> 16 hex nibbles.
    Coefficients stay far inside int64 (<= 32*255*1024^2 ~ 2.7e11).

    Bit i = u*8+v set iff C[u][v] > median; nibble j packs bits
    4j..4j+3 big-endian. Deterministic, library-free, and replayed
    exactly by the DuckDB oracle via the same integer basis."""
    import numpy as np

    n = len(payload)
    if n == 0:
        img = np.full((PHASH_IMG, PHASH_IMG), gain, dtype=np.int64)
    else:
        idx = np.arange(PHASH_IMG * PHASH_IMG) % n
        img = (
            np.frombuffer(payload, dtype=np.uint8)[idx].astype(np.int64)
            + gain
        ).reshape(PHASH_IMG, PHASH_IMG)
    basis = np.asarray(dct_basis(), dtype=np.int64)
    # u runs over the horizontal axis (x = p % 32), v over the
    # vertical (y = p // 32): C[u][v] = sum_y B[v][y] sum_x B[u][x]
    # * img[y][x] — the orientation the SQL oracle replays
    coefs = (basis @ img.T @ basis.T).ravel()
    med = np.sort(coefs[1:])[(coefs.size - 1 - 1) // 2]  # 32nd of 63
    bits = (coefs > med).astype(int)
    return "".join(
        "0123456789abcdef"[
            bits[4 * j] * 8 + bits[4 * j + 1] * 4
            + bits[4 * j + 2] * 2 + bits[4 * j + 3]
        ]
        for j in range(PHASH_SLICES)
    )


def make_phash_batch(hasher=None):
    """Perceptual-fingerprint kernel with an INJECTABLE hasher, same
    seam discipline as make_decode_batch: a media-lib hasher (decode +
    resample + pHash) plugs in as ``callable(payload: bytes, gain:
    int) -> str``; the default is :func:`dct_phash` — a REAL 32x32
    integer-DCT pHash over the raw bytes, so the default already has
    genuine pHash semantics (brightness invariance, local-edit
    locality) rather than block-md5 positional hashing. ``gain`` is a
    per-asset brightness offset (augmentation-pipeline shape; 0 when
    the column is absent). Nested so cloudpickle ships it by value."""
    hasher_fn = hasher

    def phash_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        def dct_batch(payloads, gains) -> list[str]:
            # one DCT tensor contraction for the whole Arrow batch;
            # only the byte tiling stays per-row (variable lengths;
            # the modular index is cached per distinct length)
            npix = PHASH_IMG * PHASH_IMG
            imgs = np.empty((len(payloads), npix), dtype=np.int64)
            idx_cache: dict = {}
            for r, (p, g) in enumerate(zip(payloads, gains)):
                n = len(p)
                if n == 0:
                    imgs[r] = g
                    continue
                idx = idx_cache.get(n)
                if idx is None:
                    idx = np.arange(npix) % n
                    idx_cache[n] = idx
                imgs[r] = np.frombuffer(p, dtype=np.uint8)[idx]
                imgs[r] += g
            imgs = imgs.reshape(-1, PHASH_IMG, PHASH_IMG)
            basis = np.asarray(dct_basis(), dtype=np.int64)
            t1 = imgs @ basis.T  # (B, y, u)
            coefs = (t1.transpose(0, 2, 1) @ basis.T).reshape(
                -1, PHASH_LOWFREQ * PHASH_LOWFREQ
            )  # (B, 64): [b, u*8+v]
            med = np.sort(coefs[:, 1:], axis=1)[:, (coefs.shape[1] - 2) // 2]
            bits = (coefs > med[:, None]).astype(np.int64)
            nibs = bits.reshape(-1, PHASH_SLICES, 4) @ np.array(
                [8, 4, 2, 1], dtype=np.int64
            )
            hexd = "0123456789abcdef"
            return ["".join(hexd[v] for v in row) for row in nibs]

        for pdf in it:
            gains = (
                pdf["gain"].astype(int).tolist()
                if "gain" in pdf.columns
                else [0] * len(pdf)
            )
            if hasher_fn is not None:
                hashes = [
                    hasher_fn(p, int(g))
                    for p, g in zip(pdf["payload"], gains)
                ]
            else:
                hashes = dct_batch(list(pdf["payload"]), gains)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "phash": hashes}
            )

    return phash_batch


phash_batch = make_phash_batch()


def phash_fingerprints(assets: DataFrame, hasher=None) -> DataFrame:
    """Binary payloads (+ optional int ``gain`` brightness column) ->
    16-nibble DCT-pHash fingerprints, one Arrow batch at a time."""
    kernel = phash_batch if hasher is None else make_phash_batch(hasher)
    cols = ["asset_id", "payload"] + (
        ["gain"] if "gain" in assets.columns else []
    )
    return assets.select(*cols).mapInPandas(kernel, schema=PHASH_SCHEMA)
