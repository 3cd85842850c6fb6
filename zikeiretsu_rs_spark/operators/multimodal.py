"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (PIL/ffmpeg are not in this
container): `decode_image_stub` produces deterministic fake
width/height/channel metadata derived from the payload bytes, clearly
marked. The Spark-side plumbing — schema, batch iteration, partition
behavior, UDF signatures — is real and tested, so swapping in a real
decoder is a one-function change.

Scale notes: mapInPandas streams Arrow record batches through the
Python worker — memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`, not partition size.
Binary payloads stay in Arrow buffers end-to-end (no per-row pickling).
Repartition by a size-aware key before heavy decode so stragglers
don't dominate (done here by payload length bucketing).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def _fake_decode(payload: bytes | None) -> tuple[int | None, int | None, int | None]:
    """STUB decoder: deterministic pseudo-dimensions from payload bytes.
    Replace with PIL/libvips in a real deployment (raise
    NotImplementedError there if the codec is unavailable)."""
    if payload is None or len(payload) == 0:
        return None, None, None
    h = 0
    for b in payload[:16]:
        h = (h * 31 + b) & 0x7FFFFFFF
    return 64 + h % 1024, 64 + (h // 1024) % 1024, 3


def decode_image_stub(df: DataFrame) -> DataFrame:
    """Extract image metadata via mapInPandas over binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "channels": dims.map(lambda d: d[2]),
                    "ok": dims.map(lambda d: d[0] is not None),
                }
            )

    # bucket by payload size so heavy rows spread across partitions
    sized = df.withColumn(
        "_szb", F.pmod(F.coalesce(F.length("payload"), F.lit(0)), F.lit(64))
    )
    return (
        sized.repartition(F.col("_szb"))
        .drop("_szb")
        .mapInPandas(batches, IMAGE_META_SCHEMA)
    )


def synthesize_media_from_text(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Test fixture: manufacture a binary payload column from text (the
    container ships no real media), preserving the MEDIA_SCHEMA shape."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing stub: emits (media_id, frame_no)
    rows for every n-th pseudo-frame; a real implementation would
    mapInPandas over the payload with an ffmpeg reader."""
    n_frames = F.coalesce(F.length("payload"), F.lit(0)) / F.lit(16)
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((n_frames / every_n).cast("int") - 1, F.lit(0)))
        ).alias("sample_idx"),
    ).withColumn("frame_no", F.col("sample_idx") * every_n)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def resize_image_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing via mapInPandas: deterministic stub kernel
    (truncates/pads the payload to width*height bytes). A real
    deployment swaps `_resize` for PIL/libvips; schema, Arrow batching
    and partition behavior are identical."""

    target = width * height

    def _resize(p: bytes | None) -> bytes | None:
        if p is None:
            return None
        return (p * (target // max(len(p), 1) + 1))[:target]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(_resize),
                    "ok": pdf["payload"].map(lambda p: p is not None),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def audio_features_stub(df: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """Audio feature-extraction plumbing via mapInPandas: deterministic
    stub kernel (pseudo duration/RMS from payload bytes). Replace with
    soundfile/librosa in a real deployment."""

    def _feats(p: bytes | None) -> tuple[float | None, float | None]:
        if p is None or len(p) == 0:
            return None, None
        duration = len(p) / float(2 * sample_rate)  # fake 16-bit mono
        acc = 0
        for b in p[:256]:
            acc += (b - 128) * (b - 128)
        rms = (acc / min(len(p), 256)) ** 0.5
        return duration, rms

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(_feats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "duration_s": feats.map(lambda f: f[0]),
                    "sample_rate": sample_rate,
                    "rms": feats.map(lambda f: f[1]),
                    "ok": feats.map(lambda f: f[0] is not None),
                }
            )

    return df.mapInPandas(batches, AUDIO_META_SCHEMA)
