"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata structs. The
Spark-side machinery — schemas, Arrow-batched mapInPandas operators,
partition sizing — is real and tested; the codec kernels are stubbed
(the container has no image/audio libraries) behind either a
deterministic fake (for tests) or NotImplementedError (decode), each
clearly marked.

At 100 TB the pattern is: keep binaries in their own column so parquet
column pruning skips them unless requested; decode inside mapInPandas
with small Arrow batches (`spark.sql.execution.arrow.maxRecordsPerBatch`)
to bound executor memory; emit fixed-size feature vectors, never raw
frames, across stage boundaries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB: real image decode requires PIL/opencv, absent from this
    container. The Spark plumbing around it is real; swap this body for
    the real codec in production."""
    raise NotImplementedError("image codecs not available in this environment")


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature extractor: md5-derived vector.
    Clearly fake — exists so the distributed plumbing (batching,
    schema, partitioning) is testable without codecs."""
    digest = hashlib.md5(payload or b"").digest()
    # /256 (not /255): b·2⁻⁸ is exactly representable in float32 AND
    # float64, so features compare bit-exact across engines unrounded
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas — the real operator shape for any codec kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "n_bytes": chunk["payload"].map(
                            lambda p: len(p) if p is not None else 0
                        ),
                        "features": chunk["payload"].map(_fake_features),
                    }
                )

    return media.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan: expands each video into (media_id, frame_ts)
    rows from metadata alone (no decode) — the decode of the selected
    frames is the stubbed kernel above."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(0)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
    ]
)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: tags the
    content hash with the target geometry. Swap for a real codec in
    production; the operator contract (binary in, binary out, bounded
    batches) is what's under test."""
    digest = hashlib.md5(payload or b"").digest()
    return digest + w.to_bytes(4, "big") + h.to_bytes(4, "big")


def resize_images(media: DataFrame, max_side: int = 256, batch_size: int = 64) -> DataFrame:
    """Aspect-preserving downscale plan. Target geometry is pure column
    algebra (JVM, prunable, never upscales); only the pixel transform
    crosses into Python, Arrow-batched with a small batch size because
    decoded frames are orders of magnitude larger than their payloads.
    Rows with no/degenerate geometry metadata pass through unresized."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    valid = w.isNotNull() & h.isNotNull() & (F.greatest(w, h) > 0)
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    sized = media.select(
        "media_id",
        "payload",
        F.when(valid, F.greatest(F.round(w * scale).cast("int"), F.lit(1)))
        .otherwise(F.col("meta.width"))
        .alias("out_width"),
        F.when(valid, F.greatest(F.round(h * scale).cast("int"), F.lit(1)))
        .otherwise(F.col("meta.height"))
        .alias("out_height"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                chunk["payload"] = [
                    _fake_resize(p, int(cw) if pd.notna(cw) else 0,
                                 int(ch) if pd.notna(ch) else 0)
                    if p is not None else None
                    for p, cw, ch in zip(
                        chunk["payload"], chunk["out_width"], chunk["out_height"]
                    )
                ]
                yield chunk[["media_id", "payload", "out_width", "out_height"]]

    return sized.mapInPandas(run, RESIZED_SCHEMA)
