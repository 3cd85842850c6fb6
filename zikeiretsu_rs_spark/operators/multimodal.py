"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Two tiers:

- REAL pure-Python codecs for formats that need no native libraries:
  `decode_image` parses BMP (BITMAPINFOHEADER) headers + pixel data,
  `decode_audio` parses RIFF/WAVE PCM headers + int16 samples. Paired
  with `synthesize_bmp_media` / `synthesize_wav_media`, which emit
  byte-for-byte valid files whose dimensions/samples are deterministic
  functions of the row id — so an oracle can recompute every decoded
  field (including pixel checksums and RMS) independently, and the
  decoder is verified as the inverse of the encoder.
- STUB kernels for codecs that genuinely need native libs (JPEG resize,
  video frame extraction — PIL/ffmpeg are not in this container),
  clearly marked `_stub`. The Spark-side plumbing — schema, Arrow batch
  iteration, partition behavior, UDF signatures — is identical, so
  swapping in a real decoder is a one-function change.

Scale notes: mapInPandas streams Arrow record batches through the
Python worker — memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch`, not partition size.
Binary payloads stay in Arrow buffers end-to-end (no per-row pickling).
Repartition by a size-aware key before heavy decode so stragglers
don't dominate (done here by payload length bucketing).
"""

from __future__ import annotations

import math
import struct
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


# ---------------------------------------------------------------------------
# real pure-Python codecs: BMP (image) and RIFF/WAVE PCM (audio)
# ---------------------------------------------------------------------------

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("pix_sum", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def _bmp_dims(media_id: int) -> tuple[int, int]:
    """Deterministic fixture dimensions — small enough that an oracle
    can re-derive pixel checksums via generate_series."""
    return 4 + media_id % 13, 3 + media_id % 7


def _encode_bmp(media_id: int) -> bytes:
    """Byte-for-byte valid 24bpp bottom-up BMP (BITMAPINFOHEADER, BI_RGB).
    Pixel byte i (flat, row-major, padding excluded) is
    (media_id * 131 + i * 7) % 256."""
    w, h = _bmp_dims(media_id)
    stride = (w * 3 + 3) // 4 * 4
    img_size = stride * h
    rows = []
    i = 0
    for _y in range(h):
        row = bytearray(stride)
        for x in range(w * 3):
            row[x] = (media_id * 131 + i * 7) % 256
            i += 1
        rows.append(bytes(row))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + b"".join(rows)


def _decode_bmp(payload: bytes | None):
    """Parse a BMP header + pixel data: returns (width, height,
    channels, pix_sum) or Nones when the payload is not a valid
    24bpp uncompressed BMP. pix_sum is the sum of pixel bytes with row
    padding excluded — an integrity check on the full pixel payload,
    not just the header."""
    bad = (None, None, None, None)
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return bad
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        return bad
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp % 8 != 0 or compression != 0 or w <= 0 or h == 0:
        return bad
    channels = bpp // 8
    abs_h = abs(h)
    stride = (w * channels + 3) // 4 * 4
    if len(payload) < data_off + stride * abs_h:
        return bad
    pix_sum = 0
    for y in range(abs_h):
        base = data_off + y * stride
        pix_sum += sum(payload[base : base + w * channels])
    return w, abs_h, channels, pix_sum


def synthesize_bmp_media(df: DataFrame, id_col: str) -> DataFrame:
    """Fixture generator: one real BMP payload per row, dimensions and
    pixels a pure function of the id (schema = MEDIA_SCHEMA)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "payload": ids.map(_encode_bmp),
                    "mime": "image/bmp",
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, MEDIA_SCHEMA
    )


def decode_image(df: DataFrame) -> DataFrame:
    """REAL image decode over binary payloads (BMP): header fields plus
    a padding-aware pixel checksum, via Arrow-batched mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = pdf["payload"].map(_decode_bmp)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "width": parsed.map(lambda d: d[0]),
                    "height": parsed.map(lambda d: d[1]),
                    "channels": parsed.map(lambda d: d[2]),
                    "pix_sum": parsed.map(lambda d: d[3]),
                    "ok": parsed.map(lambda d: d[0] is not None),
                }
            )

    sized = df.withColumn(
        "_szb", F.pmod(F.coalesce(F.length("payload"), F.lit(0)), F.lit(64))
    )
    return (
        sized.repartition(F.col("_szb"))
        .drop("_szb")
        .mapInPandas(batches, DECODED_IMAGE_SCHEMA)
    )


WAV_SAMPLE_RATE = 16_000


def _wav_samples(media_id: int) -> list[int]:
    """Deterministic int16 PCM fixture: n = 64 + id % 64 samples, sample
    i = ((id * 31 + i * 17) % 4096) - 2048 (zero-centered, exact in
    int64 arithmetic so RMS is oracle-recomputable)."""
    n = 64 + media_id % 64
    return [((media_id * 31 + i * 17) % 4096) - 2048 for i in range(n)]


def _encode_wav(media_id: int) -> bytes:
    samples = _wav_samples(media_id)
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, WAV_SAMPLE_RATE,
        WAV_SAMPLE_RATE * 2, 2, 16,
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def _decode_wav(payload: bytes | None):
    """Parse RIFF/WAVE PCM: walks chunks to find fmt + data, decodes
    int16 samples, computes RMS from the exact integer sum of squares.
    Returns (sample_rate, n_samples, duration_s, rms) or Nones."""
    bad = (None, None, None, None)
    if payload is None or len(payload) < 44:
        return bad
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return bad
    pos, rate, bits, n_ch, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt " and csz >= 16:
            fmt_code, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_code != 1:
                return bad
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)
    if rate is None or data is None or bits != 16 or n_ch != 1:
        return bad
    n = len(data) // 2
    if n == 0:
        return rate, 0, 0.0, None
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    sum_sq = sum(s * s for s in samples)  # exact integer
    # rms left unrounded here; decode_audio applies F.round so the
    # rounding function matches the oracle's (Spark round == DuckDB
    # round on identical IEEE inputs; Python round can differ)
    return rate, n, n / float(rate), math.sqrt(sum_sq / n)


def synthesize_wav_media(df: DataFrame, id_col: str) -> DataFrame:
    """Fixture generator: one real 16-bit mono PCM WAV per row, samples
    a pure function of the id (schema = MEDIA_SCHEMA)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "payload": ids.map(_encode_wav),
                    "mime": "audio/wav",
                }
            )

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        batches, MEDIA_SCHEMA
    )


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode over binary payloads (WAV/PCM): header fields
    plus RMS from the exact integer sum of squares."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = pdf["payload"].map(_decode_wav)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "sample_rate": parsed.map(lambda d: d[0]),
                    "n_samples": parsed.map(lambda d: d[1]),
                    "duration_s": parsed.map(lambda d: d[2]),
                    "rms": parsed.map(lambda d: d[3]),
                    "ok": parsed.map(lambda d: d[0] is not None),
                }
            )

    sized = df.withColumn(
        "_szb", F.pmod(F.coalesce(F.length("payload"), F.lit(0)), F.lit(64))
    )
    return (
        sized.repartition(F.col("_szb"))
        .drop("_szb")
        .mapInPandas(batches, DECODED_AUDIO_SCHEMA)
        .withColumn("rms", F.round("rms", 6))
    )
