"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

Two tiers:

- REAL pure-Python codecs for formats that need no native libraries:
  `decode_image` parses BMP (BITMAPINFOHEADER) headers + pixel data,
  `decode_png` fully decodes PNG (CRC-checked chunks, zlib inflate,
  all five scanline filters — the entropy coding is DEFLATE, which is
  stdlib), `decode_audio` parses RIFF/WAVE PCM headers + int16
  samples, `resize_image` does nearest-neighbor 24bpp BMP resizing
  (decode → resample → re-encode), and `frame_sample` walks a
  raw-video container (RV01) emitting every n-th frame with a pixel
  checksum. Paired with `synthesize_bmp_media` / `synthesize_png_media`
  / `synthesize_wav_media` / `synthesize_video_media`, which emit
  byte-for-byte valid files whose dimensions/samples/frames are
  deterministic functions of the row id — so an oracle can recompute
  every decoded field (pixel checksums, RMS, per-frame sums)
  independently, and each decoder is verified as the inverse of its
  encoder.
- `decode_unsupported` for codecs that genuinely need native libs
  (JPEG/WebP/H.264 — PIL/ffmpeg are not in this container): ok=false
  rows through identical Spark-side plumbing — schema, Arrow batch
  iteration, partition behavior, UDF signatures — so swapping in a
  real kernel is a one-function change.

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


def decode_unsupported(df: DataFrame) -> DataFrame:
    """Boundary for formats whose codecs genuinely need native
    libraries (JPEG/WebP/H.264 — PIL/libvips/ffmpeg are not in this
    container): every payload surfaces as ok=false with its byte size,
    through the SAME plumbing (schema, size-bucketed repartition, Arrow
    batch iteration) as the real decoders, so a deployment swaps in
    `PIL.Image.open` as the kernel and keeps everything else. PNG does
    NOT go through here — its entropy coding is zlib, which is stdlib,
    so `decode_png` is a real decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "width": None,
                    "height": None,
                    "channels": None,
                    "ok": False,  # no native codec available
                }
            )

    return _spread_for_decode(df).mapInPandas(batches, IMAGE_META_SCHEMA)


# retained alias: the former stub's call sites keep working; JPEG is
# the example format that still needs a native kernel
decode_jpeg_stub = decode_unsupported


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

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
    (media_id * 131 + i * 7) % 256. Pixels are generated as one numpy
    arange (not a Python byte loop) — the encoder runs inside Arrow
    batches on executors, so it is hot-path code."""
    import numpy as np

    w, h = _bmp_dims(media_id)
    stride = (w * 3 + 3) // 4 * 4
    img_size = stride * h
    flat = (
        (media_id * 131 + np.arange(w * 3 * h, dtype=np.int64) * 7) % 256
    ).astype(np.uint8)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = flat.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + body.tobytes()


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
    import numpy as np

    # one vectorized padding-aware sum instead of a per-byte loop
    body = np.frombuffer(
        payload, dtype=np.uint8, count=stride * abs_h, offset=data_off
    ).reshape(abs_h, stride)
    pix_sum = int(body[:, : w * channels].sum(dtype=np.int64))
    return w, abs_h, channels, pix_sum


# logical-plan node names that introduce (or follow) an exchange: if
# any appears in the decode input's lineage, upstream partitioning
# already spread the rows (shuffle output is >= shuffle.partitions,
# or AQE-advised), so the decode needs no respread — and probing
# `.rdd` there would be actively harmful: under AQE, toRdd finalizes
# the plan by MATERIALIZING every upstream shuffle stage, running the
# real work twice. The probe is therefore gated to shuffle-free
# (map-only-over-scan) lineages, where toRdd is a metadata-only call.
_SHUFFLE_NODE_MARKERS = (
    "Repartition",
    "Join",
    "Aggregate",
    "Sort",
    "Window",
    "Deduplicate",
    "Distinct",
    "Intersect",
    "Except",
)


def _spread_for_decode(df: DataFrame) -> DataFrame:
    """Decode-side partitioning: spread the payload rows only when the
    input is a map-only lineage over fewer splits than the session has
    cores (a single input split serializes the Python decode). The
    former unconditional `repartition(pmod(length(payload), 64))`
    shuffled every payload byte through an exchange on EVERY decode —
    even when the input was already evenly spread (the synthesizers'
    round-robin output, or a production scan with >= cores splits) —
    and its 64 distinct keys cap decode parallelism at 64 tasks
    regardless of cluster size. Round-robin spread is retry-safe
    (Spark's sort-before-repartition) and has no key-collision idle
    cores (optimization round 14; guide §2.3 shuffle fewer bytes /
    §2.5 synthetic-key collisions / scale-adaptive partitioning
    rule)."""
    plan = df._jdf.queryExecution().analyzed().toString()
    if any(m in plan for m in _SHUFFLE_NODE_MARKERS):
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def _synth_parallelism(df: DataFrame) -> int:
    """Task count for the fixture synthesizers: the session's
    defaultParallelism (= total cores on local[N], cluster-wide cores
    on a real deployment) instead of a hard-coded local core count —
    the synthesize repartition must scale with the executor fleet, not
    pin 32 tasks on a 1000-core cluster (optimization round 14)."""
    return df.sparkSession.sparkContext.defaultParallelism


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

    # spread synthesis across tasks: the source table is often a
    # single input split, which would serialize the encoder
    # (round-robin — an expression key hashed into N partitions has
    # balls-into-bins collisions and leaves cores idle; N follows
    # defaultParallelism, see _synth_parallelism)
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .repartition(_synth_parallelism(df))
        .mapInPandas(batches, MEDIA_SCHEMA)
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

    return _spread_for_decode(df).mapInPandas(batches, DECODED_IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# real pure-Python PNG codec: an entropy-coded format whose compression
# (DEFLATE) is in the stdlib, so no native library is needed
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_dims(media_id: int) -> tuple[int, int]:
    """Deterministic fixture dimensions, small enough for the oracle to
    re-derive pixel checksums via generate_series."""
    return 5 + media_id % 11, 4 + media_id % 5


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _encode_png(media_id: int) -> bytes:
    """Byte-for-byte valid 8-bit RGB PNG (color type 2, no interlace).
    Pixel byte i (flat row-major RGB) is (media_id * 131 + i * 7) % 256
    — the same arithmetic family as the BMP fixture, so the oracle form
    is identical. Scanline y uses filter type (media_id + y) % 5,
    exercising every PNG filter (None/Sub/Up/Average/Paeth) on every
    corpus.

    Fully numpy-vectorized: encode-side filtering predicts from RAW
    neighbor planes (left/up/upper-left shifts of the raw image), so
    every filter — Paeth included — is a whole-image array expression;
    the only Python-level work left is the zlib call. Byte-identical
    to the per-byte reference formulation (pinned by
    tests/test_multimodal_codecs.py)."""
    import zlib

    import numpy as np

    w, h = _png_dims(media_id)
    bpp = 3  # bytes per pixel, RGB8
    stride = w * bpp
    raw = (
        ((media_id * 131 + np.arange(h * stride, dtype=np.int64) * 7) % 256)
        .astype(np.int16)
        .reshape(h, stride)
    )
    left = np.zeros_like(raw)
    left[:, bpp:] = raw[:, :-bpp]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    ul = np.zeros_like(raw)
    ul[1:, bpp:] = raw[:-1, :-bpp]
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    paeth = np.where(
        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
    )
    preds = np.stack(
        [np.zeros_like(raw), left, up, (left + up) // 2, paeth]
    )  # (5, h, stride)
    ftypes = (media_id + np.arange(h, dtype=np.int64)) % 5
    chosen = preds[ftypes, np.arange(h)]
    out = np.empty((h, stride + 1), dtype=np.uint8)
    out[:, 0] = ftypes
    out[:, 1:] = ((raw - chosen) % 256).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(out.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes | None):
    """Full PNG decode: chunk walk with CRC verification, IHDR
    validation, multi-IDAT concatenation, zlib inflate, and scanline
    unfiltering for all five filter types. Supports 8-bit grayscale
    (1ch), RGB (3ch) and RGBA (4ch), non-interlaced. Returns (width,
    height, channels, pix_sum) — pix_sum over the reconstructed
    (unfiltered) pixel bytes — or Nones for anything invalid, including
    CRC corruption and truncated streams."""
    import zlib

    bad = (None, None, None, None)
    if payload is None or len(payload) < len(_PNG_SIG) + 12:
        return bad
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        return bad
    pos = len(_PNG_SIG)
    w = h = channels = None
    idat = bytearray()
    seen_iend = False
    while pos + 12 <= len(payload):
        clen = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            return bad
        crc = struct.unpack_from(">I", payload, pos + 8 + clen)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            return bad
        if ctype == b"IHDR":
            if clen != 13:
                return bad
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (
                depth != 8
                or color not in (0, 2, 6)
                or comp != 0
                or filt != 0
                or interlace != 0
                or w == 0
                or h == 0
            ):
                return bad
            channels = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_iend = True
            break
        pos += 12 + clen
    if w is None or not idat or not seen_iend:
        return bad
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return bad
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        return bad
    import numpy as np

    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = mat[:, 0]
    if (ftypes > 4).any():
        return bad
    # Scanline reconstruction. None/Up/Sub have no left-to-right data
    # dependency once the previous ROW is known, so they are whole-row
    # numpy expressions (Sub is a per-channel-lane cumsum — addition
    # mod 256 commutes with the prefix sum). Average and Paeth predict
    # from the RECONSTRUCTED left pixel, a genuinely sequential chain
    # along x, so they fall back to a tight scalar loop (vectorizing
    # 3-byte lane steps through numpy costs more per step than Python
    # ints). Row order stays sequential because every filter may read
    # the previous reconstructed row.
    pix_sum = 0
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = ftypes[y]
        line = mat[y, 1:].astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 1:
            cur = np.cumsum(line.reshape(w, channels), axis=0).reshape(
                stride
            ) % 256
        elif ftype == 2:
            cur = (line + prev) % 256
        else:
            lv = line.tolist()
            pv = prev.tolist()
            out_row = [0] * stride
            if ftype == 3:
                for x in range(stride):
                    left = out_row[x - channels] if x >= channels else 0
                    out_row[x] = (lv[x] + (left + pv[x]) // 2) & 0xFF
            else:
                for x in range(stride):
                    left = out_row[x - channels] if x >= channels else 0
                    up_v = pv[x]
                    ul = pv[x - channels] if x >= channels else 0
                    out_row[x] = (lv[x] + _paeth(left, up_v, ul)) & 0xFF
            cur = np.array(out_row, dtype=np.int64)
        pix_sum += int(cur.sum())
        prev = cur
    return w, h, channels, pix_sum


def synthesize_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Fixture generator: one real PNG payload per row, dimensions and
    pixels a pure function of the id (schema = MEDIA_SCHEMA)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "payload": ids.map(_encode_png),
                    "mime": "image/png",
                }
            )

    # spread synthesis across tasks: the source table is often a
    # single input split, which would serialize the encoder
    # (round-robin — an expression key hashed into N partitions has
    # balls-into-bins collisions and leaves cores idle; N follows
    # defaultParallelism, see _synth_parallelism)
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .repartition(_synth_parallelism(df))
        .mapInPandas(batches, MEDIA_SCHEMA)
    )


def decode_png(df: DataFrame) -> DataFrame:
    """REAL PNG decode over binary payloads: CRC-checked chunk walk,
    DEFLATE inflate, all-filter scanline reconstruction, and a pixel
    checksum over the reconstructed bytes — no n_bytes column because a
    compressed stream's length is encoder-dependent (not
    oracle-recomputable), unlike the fixed-layout BMP/WAV."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = pdf["payload"].map(_decode_png)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": parsed.map(lambda d: d[0]),
                    "height": parsed.map(lambda d: d[1]),
                    "channels": parsed.map(lambda d: d[2]),
                    "pix_sum": parsed.map(lambda d: d[3]),
                    "ok": parsed.map(lambda d: d[0] is not None),
                }
            )

    schema = T.StructType(
        [f for f in DECODED_IMAGE_SCHEMA.fields if f.name != "n_bytes"]
    )
    return _spread_for_decode(df).mapInPandas(batches, schema)


WAV_SAMPLE_RATE = 16_000


def _wav_samples(media_id: int) -> list[int]:
    """Deterministic int16 PCM fixture: n = 64 + id % 64 samples, sample
    i = ((id * 31 + i * 17) % 4096) - 2048 (zero-centered, exact in
    int64 arithmetic so RMS is oracle-recomputable)."""
    n = 64 + media_id % 64
    return [((media_id * 31 + i * 17) % 4096) - 2048 for i in range(n)]


def _encode_wav(media_id: int) -> bytes:
    import numpy as np

    n = 64 + media_id % 64
    samples = (
        (media_id * 31 + np.arange(n, dtype=np.int64) * 17) % 4096 - 2048
    ).astype("<i2")
    data = samples.tobytes()
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
    import numpy as np

    samples = np.frombuffer(data, dtype="<i2", count=n).astype(np.int64)
    sum_sq = int((samples * samples).sum())  # exact integer
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

    # spread synthesis across tasks: the source table is often a
    # single input split, which would serialize the encoder
    # (round-robin — an expression key hashed into N partitions has
    # balls-into-bins collisions and leaves cores idle; N follows
    # defaultParallelism, see _synth_parallelism)
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .repartition(_synth_parallelism(df))
        .mapInPandas(batches, MEDIA_SCHEMA)
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

    return (
        _spread_for_decode(df)
        .mapInPandas(batches, DECODED_AUDIO_SCHEMA)
        .withColumn("rms", F.round("rms", 6))
    )


# ---------------------------------------------------------------------------
# real pure-Python transforms: nearest-neighbor BMP resize and raw-video
# frame sampling
# ---------------------------------------------------------------------------


def _resize_bmp(payload: bytes | None, out_w: int, out_h: int) -> bytes | None:
    """Nearest-neighbor resize of a 24bpp uncompressed BMP, emitting a
    byte-valid 24bpp BMP. Both source and destination are stored in the
    same (bottom-up) row order, so sampling in file space IS sampling
    in image space. Returns None for payloads that are not plain 24bpp
    BMPs."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h <= 0:
        return None
    src_stride = (w * 3 + 3) // 4 * 4
    if len(payload) < data_off + src_stride * h:
        return None
    import numpy as np

    out_stride = (out_w * 3 + 3) // 4 * 4
    src = np.frombuffer(
        payload, dtype=np.uint8, count=src_stride * h, offset=data_off
    ).reshape(h, src_stride)[:, : w * 3].reshape(h, w, 3)
    src_y = np.arange(out_h, dtype=np.int64) * h // out_h
    src_x = np.arange(out_w, dtype=np.int64) * w // out_w
    resampled = src[src_y[:, None], src_x[None, :], :]  # (out_h, out_w, 3)
    body = np.zeros((out_h, out_stride), dtype=np.uint8)
    body[:, : out_w * 3] = resampled.reshape(out_h, out_w * 3)
    img_size = out_stride * out_h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, out_w, out_h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + body.tobytes()


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize over binary payloads (24bpp BMP, pure-Python
    nearest-neighbor) via Arrow-batched mapInPandas; same schema and
    batching as the former stub. Payloads the codec cannot handle
    surface as ok=false rather than failing the job."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(lambda p: _resize_bmp(p, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                    "ok": resized.map(lambda p: p is not None),
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


VIDEO_MAGIC = b"RV01"
VIDEO_W, VIDEO_H = 8, 6  # fixture frame dimensions (grayscale bytes)


def _video_n_frames(media_id: int) -> int:
    return 4 + media_id % 9


def _encode_rawvideo(media_id: int) -> bytes:
    """Byte-valid raw-video fixture container: magic 'RV01', u16 width/
    height/n_frames (LE), then n_frames grayscale frames of w*h bytes.
    Frame f, pixel i = (media_id * 7 + f * 13 + i * 3) % 256 — exact
    integer arithmetic, so an oracle can re-derive per-frame sums."""
    import numpy as np

    n = _video_n_frames(media_id)
    f_idx = np.repeat(np.arange(n, dtype=np.int64), VIDEO_W * VIDEO_H)
    i_idx = np.tile(np.arange(VIDEO_W * VIDEO_H, dtype=np.int64), n)
    frames = ((media_id * 7 + f_idx * 13 + i_idx * 3) % 256).astype(np.uint8)
    return VIDEO_MAGIC + struct.pack("<HHH", VIDEO_W, VIDEO_H, n) + frames.tobytes()


def _decode_rawvideo(payload: bytes | None):
    """Parse the RV01 header: returns (width, height, n_frames, frames
    bytes) or Nones when invalid/truncated."""
    bad = (None, None, None, None)
    if payload is None or len(payload) < 10 or payload[:4] != VIDEO_MAGIC:
        return bad
    w, h, n = struct.unpack_from("<HHH", payload, 4)
    if w == 0 or h == 0 or len(payload) < 10 + w * h * n:
        return bad
    return w, h, n, payload[10 : 10 + w * h * n]


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_no", T.IntegerType(), True),
        T.StructField("frame_sum", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def synthesize_video_media(df: DataFrame, id_col: str) -> DataFrame:
    """Fixture generator: one real RV01 payload per row, frame pixels a
    pure function of the id (schema = MEDIA_SCHEMA)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "video",
                    "payload": ids.map(_encode_rawvideo),
                    "mime": "video/x-raw",
                }
            )

    # spread synthesis across tasks: the source table is often a
    # single input split, which would serialize the encoder
    # (round-robin — an expression key hashed into N partitions has
    # balls-into-bins collisions and leaves cores idle; N follows
    # defaultParallelism, see _synth_parallelism)
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .repartition(_synth_parallelism(df))
        .mapInPandas(batches, MEDIA_SCHEMA)
    )


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video frame sampling over binary payloads (RV01 container):
    decode the header, take every ``every_n``-th frame, and emit one
    row per sampled frame with its pixel-sum checksum — the shape a
    downstream vision encoder consumes (media_id, frame_no, frame
    bytes/features). Invalid payloads yield a single ok=false row, so
    corrupt media is observable, never silently dropped."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": [],
                "width": [],
                "height": [],
                "n_frames": [],
                "frame_no": [],
                "frame_sum": [],
                "ok": [],
            }
            import numpy as np

            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, n, frames = _decode_rawvideo(p)
                if w is None:
                    out["media_id"].append(mid)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_frames"].append(None)
                    out["frame_no"].append(None)
                    out["frame_sum"].append(None)
                    out["ok"].append(False)
                    continue
                # all per-frame sums in one vectorized pass
                sums = (
                    np.frombuffer(frames, dtype=np.uint8)
                    .reshape(n, w * h)
                    .sum(axis=1, dtype=np.int64)
                )
                for f in range(0, n, every_n):
                    out["media_id"].append(mid)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(n)
                    out["frame_no"].append(f)
                    out["frame_sum"].append(int(sums[f]))
                    out["ok"].append(True)
            yield pd.DataFrame(out)

    return _spread_for_decode(df).mapInPandas(batches, FRAME_SCHEMA)


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("n_in_frame", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("n_zero_cross", T.IntegerType(), True),
    ]
)


def _decode_wav_samples(payload: bytes | None):
    """RIFF/WAVE chunk walk returning the raw int16 mono samples (or
    None) — the sample-level twin of `_decode_wav` for feature
    extraction."""
    if payload is None or len(payload) < 44:
        return None
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, bits, n_ch, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt " and csz >= 16:
            fmt_code, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_code != 1:
                return None
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)
    if rate is None or data is None or bits != 16 or n_ch != 1:
        return None
    import numpy as np

    return np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(
        np.int64
    )


def audio_frame_features(df: DataFrame, frame_len: int = 32) -> DataFrame:
    """Per-frame audio features over decoded PCM: RMS (from the exact
    integer sum of squares) and zero-crossing count per non-overlapping
    `frame_len`-sample frame — the feature-extraction stage of an
    audio curation pipeline (silence trimming, energy filtering),
    computed with real decoded samples, no native audio libs.

    Frames are row-local (one media payload explodes to its frames
    inside the Arrow batch — no shuffle); a zero crossing is a sign
    change between adjacent samples WITHIN the frame (sign(x) := x >= 0).

    Output: media_id, frame_idx, n_in_frame, rms (round 6),
    n_zero_cross.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_f, out_n, out_r, out_z = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples = _decode_wav_samples(payload)
                if samples is None or len(samples) == 0:
                    continue
                n = len(samples)
                for f in range((n + frame_len - 1) // frame_len):
                    fr = samples[f * frame_len : (f + 1) * frame_len]
                    cnt = len(fr)
                    sum_sq = int((fr * fr).sum())
                    nonneg = fr >= 0
                    zc = int((nonneg[1:] != nonneg[:-1]).sum())
                    out_id.append(mid)
                    out_f.append(f)
                    out_n.append(cnt)
                    out_r.append(math.sqrt(sum_sq / cnt))
                    out_z.append(zc)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_f, dtype="int32"),
                    "n_in_frame": pd.Series(out_n, dtype="int32"),
                    "rms": pd.Series(out_r, dtype="float64"),
                    "n_zero_cross": pd.Series(out_z, dtype="int32"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, AUDIO_FRAMES_SCHEMA
    ).withColumn("rms", F.round("rms", 6))


# ---------------------------------------------------------------------------
# real pure-Python GIF codec (LZW entropy coding)
# ---------------------------------------------------------------------------

GIF_MIN_CODE_SIZE = 8  # 256-color global palette


def _gif_dims(media_id: int) -> tuple[int, int]:
    """Deterministic fixture dimensions: large enough that the LZW
    string table crosses the 512-entry boundary (so variable code-width
    growth 9->10 bits is exercised on every payload)."""
    return 16 + media_id % 17, 12 + media_id % 11


_GIF_PALETTE_CACHE: bytes | None = None


def _gif_palette_bytes() -> bytes:
    """256-entry global color table; entry j = (j, j*7 % 256,
    j*37 % 256) — pure id arithmetic, oracle-recomputable. Constant,
    so built once per process (it is appended to every payload)."""
    global _GIF_PALETTE_CACHE
    if _GIF_PALETTE_CACHE is None:
        out = bytearray()
        for j in range(256):
            out += bytes((j, (j * 7) % 256, (j * 37) % 256))
        _GIF_PALETTE_CACHE = bytes(out)
    return _GIF_PALETTE_CACHE


def _gif_indices(media_id: int, n: int):
    """Pixel palette indices: i -> (media_id*131 + i*7) % 256."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return ((media_id * 131 + i * 7) % 256).astype(np.uint8)


def _lzw_compress(indices, min_code_size: int = GIF_MIN_CODE_SIZE) -> bytes:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, LSB-first bit packing, CLEAR emitted first, EOI
    last, table reset at 4096 entries. Code widths follow the
    DECODER's table-growth schedule (the decoder lags the encoder's
    table by one entry — simulating the decoder sidesteps the classic
    early-change off-by-one and matches GIF89a, which has none)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bit_buf = 0
    bit_cnt = 0

    # decoder-simulated width state
    dec_next = eoi + 1
    dec_width = min_code_size + 1
    first_after_clear = True

    def emit(code: int) -> None:
        nonlocal bit_buf, bit_cnt, dec_next, dec_width, first_after_clear
        bit_buf |= code << bit_cnt
        bit_cnt += dec_width
        while bit_cnt >= 8:
            out.append(bit_buf & 0xFF)
            bit_buf >>= 8
            bit_cnt -= 8

    def account(code: int) -> None:
        # decoder table bookkeeping AFTER it reads `code`
        nonlocal dec_next, dec_width, first_after_clear
        if code == clear:
            dec_next = eoi + 1
            dec_width = min_code_size + 1
            first_after_clear = True
            return
        if code == eoi:
            return
        if first_after_clear:
            first_after_clear = False
            return
        if dec_next < 4096:
            dec_next += 1
            if dec_next == (1 << dec_width) and dec_width < 12:
                dec_width += 1

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1

    emit(clear)
    account(clear)
    w = b""
    for k in bytes(indices):
        wk = w + bytes((k,))
        if wk in table:
            w = wk
            continue
        emit(table[w])
        account(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:
            # table full: reset both sides (spec-conformant CLEAR)
            emit(clear)
            account(clear)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
        w = bytes((k,))
    if w:
        emit(table[w])
        account(table[w])
    emit(eoi)
    if bit_cnt:
        out.append(bit_buf & 0xFF)
    return bytes(out)


def _lzw_decompress(
    data: bytes, min_code_size: int = GIF_MIN_CODE_SIZE
) -> bytes | None:
    """GIF-variant LZW decoder (spec rule: width grows when the next
    table slot reaches 2**width; no early change). Returns None on a
    malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1

    base = [bytes((i,)) for i in range(clear)]
    table = list(base)
    table += [b"", b""]  # clear / eoi placeholders
    width = min_code_size + 1

    out = bytearray()
    prev: bytes | None = None
    bit_buf = 0
    bit_cnt = 0
    pos = 0
    n = len(data)
    while True:
        while bit_cnt < width:
            if pos >= n:
                return None  # ran out before EOI
            bit_buf |= data[pos] << bit_cnt
            bit_cnt += 8
            pos += 1
        code = bit_buf & ((1 << width) - 1)
        bit_buf >>= width
        bit_cnt -= width
        if code == clear:
            table = list(base) + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
            out += entry
            prev = entry
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _encode_gif(media_id: int) -> bytes:
    """Byte-valid GIF89a fixture: logical screen descriptor, 256-entry
    global color table, a Graphic Control Extension (so decoders must
    walk extension sub-blocks), one image descriptor, LZW-compressed
    indices in 255-byte sub-blocks, trailer."""
    w, h = _gif_dims(media_id)
    idx = _gif_indices(media_id, w * h)
    lzw = _lzw_compress(idx)

    out = bytearray(b"GIF89a")
    # packed: GCT present (0x80) | 8 bpp color res (0x70) | GCT size 7
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _gif_palette_bytes()
    # graphic control extension: introducer, label, block size 4,
    # packed=0, delay=0, transparent index=0, terminator
    out += bytes((0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00))
    # image descriptor: no local color table, no interlace
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x00)
    out += bytes((GIF_MIN_CODE_SIZE,))
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


DECODED_GIF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("idx_sum", T.LongType(), True),
        T.StructField("rgb_sum", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def _gif_interlace_order(height: int) -> list[int]:
    """GIF89a interlace row transmission order: pass 1 = rows 0,8,16…,
    pass 2 = 4,12,…, pass 3 = 2,6,10,…, pass 4 = 1,3,5,… — the stored
    scanline sequence an interlaced image's LZW stream carries."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def _decode_gif(payload: bytes | None):
    """REAL GIF decode: header + logical screen descriptor, global
    color table, extension-block walk, image descriptor (+ optional
    local color table), LZW decompression, palette mapping. Returns
    (width, height, channels, idx_sum, rgb_sum) or Nones."""
    import numpy as np

    bad = (None, None, None, None, None)
    if payload is None or len(payload) < 13:
        return bad
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return bad
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n_ent = 2 << (packed & 0x07)
        if len(payload) < pos + 3 * n_ent:
            return bad
        palette = np.frombuffer(
            payload[pos : pos + 3 * n_ent], dtype=np.uint8
        ).reshape(n_ent, 3)
        pos += 3 * n_ent
    while pos < len(payload):
        intro = payload[pos]
        if intro == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1  # terminator
        elif intro == 0x2C:  # image descriptor
            if len(payload) < pos + 10:
                return bad
            _x, _y, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x80:  # local color table overrides
                n_ent = 2 << (ipacked & 0x07)
                if len(payload) < pos + 3 * n_ent:
                    return bad
                palette = np.frombuffer(
                    payload[pos : pos + 3 * n_ent], dtype=np.uint8
                ).reshape(n_ent, 3)
                pos += 3 * n_ent
            interlaced = bool(ipacked & 0x40)
            if pos >= len(payload) or palette is None:
                return bad
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                blen = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + blen]
                pos += 1 + blen
            pos += 1  # block terminator
            if not (2 <= mcs <= 8):
                return bad
            raw = _lzw_decompress(bytes(lzw), mcs)
            if raw is None or len(raw) != iw * ih:
                return bad
            idx = np.frombuffer(raw, dtype=np.uint8)
            if interlaced:
                rows = idx.reshape(ih, iw)
                out_rows = np.empty_like(rows)
                out_rows[_gif_interlace_order(ih)] = rows
                idx = out_rows.reshape(-1)
            if int(idx.max(initial=0)) >= len(palette):
                return bad
            rgb = palette[idx]
            return (
                int(iw),
                int(ih),
                3,
                int(idx.sum(dtype=np.int64)),
                int(rgb.sum(dtype=np.int64)),
            )
        elif intro == 0x3B:  # trailer before any image
            return bad
        else:
            return bad
    return bad


def synthesize_mixed_media(df: DataFrame, id_col: str) -> DataFrame:
    """One-pass fixture generator for the five-format triage mix: each
    row routed by id % 5 to the BMP/PNG/WAV/GIF/RV01 encoder —
    byte-identical payloads, kinds and mimes to the union of the five
    per-format synthesizers over the id%5 partitions of the input.
    Replaces five filtered synth branches (5 exchanges + 5 Python
    stages, each over 1/5 of the ids, whose task scheduling dominates
    the tiny per-branch encode work) with ONE round-robin spread and
    ONE Arrow stage (optimization round 14; guide §2.4 remove shuffles
    outright)."""
    routes = {
        0: ("image", _encode_bmp, "image/bmp"),
        1: ("image", _encode_png, "image/png"),
        2: ("audio", _encode_wav, "audio/wav"),
        3: ("image", _encode_gif, "image/gif"),
        4: ("video", _encode_rawvideo, "video/x-raw"),
    }

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            mods = (ids % 5).tolist()
            vals = ids.tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [routes[m][0] for m in mods],
                    "payload": [routes[m][1](i) for i, m in zip(vals, mods)],
                    "mime": [routes[m][2] for m in mods],
                }
            )

    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .repartition(_synth_parallelism(df))
        .mapInPandas(batches, MEDIA_SCHEMA)
    )


def synthesize_gif_media(df: DataFrame, id_col: str) -> DataFrame:
    """Fixture generator: one real GIF89a payload per row, palette
    indices a pure function of the id (schema = MEDIA_SCHEMA)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "payload": ids.map(_encode_gif),
                    "mime": "image/gif",
                }
            )

    # spread synthesis across tasks: the source table is often a
    # single input split, which would serialize the encoder
    # (round-robin — an expression key hashed into N partitions has
    # balls-into-bins collisions and leaves cores idle; N follows
    # defaultParallelism, see _synth_parallelism)
    return (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .repartition(_synth_parallelism(df))
        .mapInPandas(batches, MEDIA_SCHEMA)
    )


def decode_gif(df: DataFrame) -> DataFrame:
    """REAL GIF decode over binary payloads: extension walk, LZW
    decompression (variable code widths, table resets), palette-mapped
    RGB checksum. No n_bytes column — LZW stream length is
    encoder-dependent, like PNG's DEFLATE."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = pdf["payload"].map(_decode_gif)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": parsed.map(lambda d: d[0]),
                    "height": parsed.map(lambda d: d[1]),
                    "channels": parsed.map(lambda d: d[2]),
                    "idx_sum": parsed.map(lambda d: d[3]),
                    "rgb_sum": parsed.map(lambda d: d[4]),
                    "ok": parsed.map(lambda d: d[0] is not None),
                }
            )

    return _spread_for_decode(df).mapInPandas(batches, DECODED_GIF_SCHEMA)


def sniff_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container-format detection + header-only dimension extraction —
    the routing step of a mixed media lake (decide the decoder WITHOUT
    decoding; a 100 TB bucket of mixed crawl media is triaged by magic
    bytes before any pixel work). PURE Catalyst expressions over the
    binary column: hex-compare the magic prefix, then assemble
    width/height from the fixed header offsets of the matched format —
    byte-level arithmetic (conv(hex(substring))) stays inside
    whole-stage codegen; the payload body is never touched, so column
    pruning plus Parquet byte-range reads keep IO at header scale.

    Formats: BMP ('BM'; LE int32 dims at offsets 19/23),
    PNG (8-byte signature; BE int32 IHDR dims at 17/21),
    RIFF/WAVE ('RIFF'+'WAVE'; no dims), GIF89a (LE uint16 at 7/9),
    RV01 raw video (LE uint16 at 5/7). Unknown formats pass through
    with NULL dims — never an error (triage must not die on junk
    bytes; reference decode-unsupported boundary:
    query/executor semantics for unknown payloads).

    Output: media_id, format, width, height (NULL where the format
    has none or is unknown).
    """
    p = F.col(payload_col)

    def byte_at(pos: int):
        return F.conv(F.hex(F.substring(p, pos, 1)), 16, 10).cast("long")

    def le16(pos: int):
        return byte_at(pos) + byte_at(pos + 1) * 256

    def le32(pos: int):
        return (
            byte_at(pos)
            + byte_at(pos + 1) * 256
            + byte_at(pos + 2) * 65536
            + byte_at(pos + 3) * 16777216
        )

    def be32(pos: int):
        return (
            byte_at(pos) * 16777216
            + byte_at(pos + 1) * 65536
            + byte_at(pos + 2) * 256
            + byte_at(pos + 3)
        )

    is_bmp = F.hex(F.substring(p, 1, 2)) == "424D"
    is_png = F.hex(F.substring(p, 1, 8)) == "89504E470D0A1A0A"
    is_wav = (F.hex(F.substring(p, 1, 4)) == "52494646") & (
        F.hex(F.substring(p, 9, 4)) == "57415645"
    )
    is_gif = F.hex(F.substring(p, 1, 6)) == "474946383961"
    is_rv = F.hex(F.substring(p, 1, 4)) == "52563031"
    fmt = (
        F.when(is_bmp, F.lit("bmp"))
        .when(is_png, F.lit("png"))
        .when(is_wav, F.lit("wav"))
        .when(is_gif, F.lit("gif"))
        .when(is_rv, F.lit("rv01"))
        .otherwise(F.lit("unknown"))
    )
    width = (
        F.when(is_bmp, le32(19))
        .when(is_png, be32(17))
        .when(is_gif, le16(7))
        .when(is_rv, le16(5))
        .otherwise(F.lit(None).cast("long"))
    )
    height = (
        F.when(is_bmp, le32(23))
        .when(is_png, be32(21))
        .when(is_gif, le16(9))
        .when(is_rv, le16(7))
        .otherwise(F.lit(None).cast("long"))
    )
    return df.select(
        "media_id",
        fmt.alias("format"),
        width.alias("width"),
        height.alias("height"),
    )
