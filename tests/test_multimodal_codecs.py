"""Real multimodal codecs: BMP and RIFF/WAVE round-trips, malformed
payload rejection, and the Spark mapInPandas plumbing around them.

The synthesize->decode pair is the oracle contract for the
multimodal_decode / multimodal_audio suite queries: every decoded field
is independently recomputable from the row id, so these tests pin the
pure-Python kernels the driver's DuckDB gate cross-checks."""

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from zikeiretsu_rs_spark.operators import multimodal
from zikeiretsu_rs_spark.operators.multimodal import (
    _bmp_dims,
    _decode_bmp,
    _decode_png,
    _decode_wav,
    _encode_bmp,
    _encode_png,
    _encode_wav,
    _png_dims,
    _wav_samples,
)


class TestBmpCodec:
    @pytest.mark.parametrize("media_id", [0, 1, 7, 12, 13, 91, 12345])
    def test_roundtrip(self, media_id):
        w, h = _bmp_dims(media_id)
        payload = _encode_bmp(media_id)
        expect_sum = sum(
            (media_id * 131 + i * 7) % 256 for i in range(w * h * 3)
        )
        assert _decode_bmp(payload) == (w, h, 3, expect_sum)
        stride = (w * 3 + 3) // 4 * 4
        assert len(payload) == 54 + stride * h

    def test_header_fields_are_valid_bmp(self):
        p = _encode_bmp(5)
        assert p[:2] == b"BM"
        assert struct.unpack_from("<I", p, 2)[0] == len(p)  # file size
        assert struct.unpack_from("<I", p, 10)[0] == 54  # data offset
        assert struct.unpack_from("<I", p, 14)[0] == 40  # DIB size
        assert struct.unpack_from("<H", p, 28)[0] == 24  # bpp

    @pytest.mark.parametrize(
        "payload",
        [
            None,
            b"",
            b"PNG not bmp",
            b"BM" + b"\x00" * 10,  # too short
            _encode_bmp(3)[:-1],  # truncated pixel data
        ],
    )
    def test_malformed_rejected(self, payload):
        assert _decode_bmp(payload) == (None, None, None, None)

    def test_top_down_bmp_accepted(self):
        # negative height = top-down row order; dims must still parse
        p = bytearray(_encode_bmp(9))
        w, h = _bmp_dims(9)
        struct.pack_into("<i", p, 22, -h)
        got = _decode_bmp(bytes(p))
        assert (got[0], got[1], got[2]) == (w, h, 3)


class TestWavCodec:
    @pytest.mark.parametrize("media_id", [0, 1, 63, 64, 12345])
    def test_roundtrip(self, media_id):
        samples = _wav_samples(media_id)
        payload = _encode_wav(media_id)
        rate, n, dur, rms = _decode_wav(payload)
        assert (rate, n) == (16_000, len(samples))
        assert dur == len(samples) / 16_000.0
        expect = math.sqrt(sum(s * s for s in samples) / len(samples))
        assert rms == expect
        assert len(payload) == 44 + 2 * len(samples)

    @pytest.mark.parametrize(
        "payload",
        [None, b"", b"RIFFxxxxWAVE", b"OggS" + b"\x00" * 64],
    )
    def test_malformed_rejected(self, payload):
        assert _decode_wav(payload) == (None, None, None, None)

    def test_stereo_rejected(self):
        p = bytearray(_encode_wav(3))
        struct.pack_into("<H", p, 22, 2)  # channels = 2
        assert _decode_wav(bytes(p)) == (None, None, None, None)


class TestCodecProperties:
    """Hypothesis: encode->decode is the identity on every field, for
    any media id (the oracle contract is exactly this inverse)."""

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=2**31 - 1))
    def test_bmp_roundtrip_any_id(self, media_id):
        w, h = _bmp_dims(media_id)
        got = _decode_bmp(_encode_bmp(media_id))
        assert got[:3] == (w, h, 3)
        assert got[3] == sum(
            (media_id * 131 + i * 7) % 256 for i in range(w * h * 3)
        )

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=2**31 - 1))
    def test_wav_roundtrip_any_id(self, media_id):
        samples = _wav_samples(media_id)
        rate, n, dur, rms = _decode_wav(_encode_wav(media_id))
        assert (rate, n) == (16_000, len(samples))
        assert rms == math.sqrt(sum(s * s for s in samples) / n)

    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=128))
    def test_decoders_never_crash_on_garbage(self, payload):
        r1 = _decode_bmp(payload)
        r2 = _decode_wav(payload)
        assert len(r1) == 4 and len(r2) == 4


class TestSparkPlumbing:
    def test_bmp_synthesize_decode(self, spark):
        df = spark.range(0, 20).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_bmp_media(df, "doc_id")
        out = {r["media_id"]: r for r in multimodal.decode_image(media).collect()}
        assert len(out) == 20
        for mid, r in out.items():
            w, h = _bmp_dims(mid)
            assert (r["width"], r["height"], r["channels"], r["ok"]) == (w, h, 3, True)

    def test_wav_synthesize_decode(self, spark):
        df = spark.range(0, 20).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_wav_media(df, "doc_id")
        out = {r["media_id"]: r for r in multimodal.decode_audio(media).collect()}
        assert len(out) == 20
        for mid, r in out.items():
            assert r["ok"] and r["sample_rate"] == 16_000
            assert r["n_samples"] == 64 + mid % 64

    def test_decode_image_bad_payload_rows(self, spark):
        rows = [(1, "image", bytearray(b"not a bmp"), "x"), (2, "image", None, "x")]
        media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in multimodal.decode_image(media).collect()}
        assert not out[1]["ok"] and not out[2]["ok"]
        assert out[1]["width"] is None


class TestSpreadForDecode:
    """Decode-side partitioning rules (optimization round 14): spread
    only map-only narrow lineages; never touch (or .rdd-probe, which
    would materialize AQE stages) a lineage that already shuffled."""

    def test_synth_lineage_untouched(self, spark):
        df = spark.range(0, 8).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_bmp_media(df, "doc_id")
        # the synthesizer's round-robin repartition is in the lineage,
        # so the decode adds no second exchange
        assert multimodal._spread_for_decode(media) is media

    def test_shuffle_lineage_untouched(self, spark):
        rows = [(1, "image", bytearray(b"x"), "m")]
        media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        agg = media.groupBy("media_id", "kind", "mime").agg(
            F.first("payload").alias("payload")
        )
        assert multimodal._spread_for_decode(agg) is agg

    def test_narrow_scan_is_spread(self, spark, tmp_path):
        df = spark.range(0, 50).select(F.col("id").alias("doc_id"))
        p = str(tmp_path / "media.parquet")
        multimodal.synthesize_bmp_media(df, "doc_id").coalesce(1).write.parquet(p)
        media = spark.read.parquet(p)
        sc = spark.sparkContext
        spread = multimodal._spread_for_decode(media)
        assert spread is not media
        assert spread.rdd.getNumPartitions() == sc.defaultParallelism
        out = {r["media_id"]: r for r in multimodal.decode_image(media).collect()}
        assert len(out) == 50 and all(r["ok"] for r in out.values())


class TestMixedSynthesizer:
    """synthesize_mixed_media (optimization round 14) must equal the
    union of the five per-format synthesizers over the id%5 routes —
    byte-identical payloads, kinds and mimes."""

    def test_mixed_equals_five_branch_union(self, spark):
        df = spark.range(0, 25).select(F.col("id").alias("doc_id"))
        branches = [
            multimodal.synthesize_bmp_media(
                df.where(F.col("doc_id") % 5 == 0), "doc_id"
            ),
            multimodal.synthesize_png_media(
                df.where(F.col("doc_id") % 5 == 1), "doc_id"
            ),
            multimodal.synthesize_wav_media(
                df.where(F.col("doc_id") % 5 == 2), "doc_id"
            ),
            multimodal.synthesize_gif_media(
                df.where(F.col("doc_id") % 5 == 3), "doc_id"
            ),
            multimodal.synthesize_video_media(
                df.where(F.col("doc_id") % 5 == 4), "doc_id"
            ),
        ]
        union = branches[0]
        for b in branches[1:]:
            union = union.unionByName(b)
        want = {
            r["media_id"]: (r["kind"], bytes(r["payload"]), r["mime"])
            for r in union.collect()
        }
        got = {
            r["media_id"]: (r["kind"], bytes(r["payload"]), r["mime"])
            for r in multimodal.synthesize_mixed_media(df, "doc_id").collect()
        }
        assert got == want and len(got) == 25


class TestResizeKernel:
    @pytest.mark.parametrize("media_id", [0, 1, 7, 13, 91, 12345])
    def test_resize_then_decode_matches_reference(self, media_id):
        from zikeiretsu_rs_spark.operators.multimodal import _resize_bmp

        w, h = _bmp_dims(media_id)
        out_w, out_h = 8, 6
        resized = _resize_bmp(_encode_bmp(media_id), out_w, out_h)
        gw, gh, ch, pix_sum = _decode_bmp(resized)
        assert (gw, gh, ch) == (out_w, out_h, 3)
        # reference: nearest-neighbor sample of the encoder's pixel fn
        expect = 0
        for y in range(out_h):
            sy = y * h // out_h
            for x in range(out_w):
                sx = x * w // out_w
                for c in range(3):
                    j = (sy * w + sx) * 3 + c
                    expect += (media_id * 131 + j * 7) % 256
        assert pix_sum == expect

    def test_identity_resize_preserves_pixels(self):
        mid = 17
        w, h = _bmp_dims(mid)
        from zikeiretsu_rs_spark.operators.multimodal import _resize_bmp

        same = _resize_bmp(_encode_bmp(mid), w, h)
        assert _decode_bmp(same) == _decode_bmp(_encode_bmp(mid))

    @pytest.mark.parametrize("payload", [None, b"", b"JUNK" * 30])
    def test_resize_rejects_non_bmp(self, payload):
        from zikeiretsu_rs_spark.operators.multimodal import _resize_bmp

        assert _resize_bmp(payload, 8, 6) is None

    @settings(max_examples=100, deadline=None)
    @given(
        st.integers(min_value=0, max_value=2**31 - 1),
        st.integers(min_value=1, max_value=16),
        st.integers(min_value=1, max_value=16),
    )
    def test_resize_always_valid_bmp(self, media_id, out_w, out_h):
        from zikeiretsu_rs_spark.operators.multimodal import _resize_bmp

        resized = _resize_bmp(_encode_bmp(media_id), out_w, out_h)
        gw, gh, ch, _ = _decode_bmp(resized)
        assert (gw, gh, ch) == (out_w, out_h, 3)


class TestRawVideoCodec:
    @pytest.mark.parametrize("media_id", [0, 1, 8, 9, 77])
    def test_header_and_frames(self, media_id):
        from zikeiretsu_rs_spark.operators.multimodal import (
            _decode_rawvideo,
            _encode_rawvideo,
            _video_n_frames,
            VIDEO_H,
            VIDEO_W,
        )

        w, h, n, frames = _decode_rawvideo(_encode_rawvideo(media_id))
        assert (w, h, n) == (VIDEO_W, VIDEO_H, _video_n_frames(media_id))
        assert len(frames) == w * h * n
        for f in range(n):
            expect = sum(
                (media_id * 7 + f * 13 + i * 3) % 256 for i in range(w * h)
            )
            assert sum(frames[f * w * h : (f + 1) * w * h]) == expect

    @pytest.mark.parametrize(
        "payload", [None, b"", b"XXXX\x00" * 4, b"RV01\x08\x00\x06\x00\xff\x00"]
    )
    def test_malformed_rejected(self, payload):
        from zikeiretsu_rs_spark.operators.multimodal import _decode_rawvideo

        assert _decode_rawvideo(payload) == (None, None, None, None)


class TestResizeAndFramesPlumbing:
    def test_resize_image_spark(self, spark):
        df = spark.range(0, 15).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_bmp_media(df, "doc_id")
        out = multimodal.decode_image(multimodal.resize_image(media, 8, 6))
        rows = {r["media_id"]: r for r in out.collect()}
        assert len(rows) == 15
        assert all(
            r["ok"] and (r["width"], r["height"]) == (8, 6)
            for r in rows.values()
        )

    def test_frame_sample_spark(self, spark):
        from zikeiretsu_rs_spark.operators.multimodal import _video_n_frames

        df = spark.range(0, 15).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_video_media(df, "doc_id")
        out = multimodal.frame_sample(media, every_n=2).collect()
        by_id = {}
        for r in out:
            assert r["ok"] and r["frame_no"] % 2 == 0
            by_id.setdefault(r["media_id"], []).append(r["frame_no"])
        for mid, frames in by_id.items():
            n = _video_n_frames(mid)
            assert sorted(frames) == list(range(0, n, 2))

    def test_frame_sample_bad_payload_row(self, spark):
        rows = [(1, "video", bytearray(b"not video"), "x")]
        media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = multimodal.frame_sample(media).collect()
        assert len(out) == 1 and not out[0]["ok"]


class TestPngCodec:
    """Full PNG decode: CRC-checked chunks, zlib inflate, all-filter
    scanline reconstruction. The encoder cycles the filter type per
    scanline, so every roundtrip exercises None/Sub/Up/Average/Paeth."""

    @pytest.mark.parametrize("media_id", [0, 1, 4, 5, 11, 54, 12345])
    def test_roundtrip(self, media_id):
        w, h = _png_dims(media_id)
        expect_sum = sum(
            (media_id * 131 + i * 7) % 256 for i in range(w * h * 3)
        )
        assert _decode_png(_encode_png(media_id)) == (w, h, 3, expect_sum)

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=2**31 - 1))
    def test_roundtrip_any_id(self, media_id):
        w, h = _png_dims(media_id)
        got = _decode_png(_encode_png(media_id))
        assert got[:3] == (w, h, 3)
        assert got[3] == sum(
            (media_id * 131 + i * 7) % 256 for i in range(w * h * 3)
        )

    def test_grayscale_and_rgba_paths(self):
        import struct as _s
        import zlib

        def chunk(t, b):
            return (
                _s.pack(">I", len(b)) + t + b
                + _s.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        # 2x2 grayscale, filter 0: pixels 10,20 / 30,40
        raw = bytes([0, 10, 20, 0, 30, 40])
        png = (
            sig
            + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert _decode_png(png) == (2, 2, 1, 100)
        # 1x2 RGBA, row 2 Up-filtered: actual row2 = row1 + 5 per byte
        row1, row2_delta = bytes([1, 2, 3, 4]), bytes([5, 5, 5, 5])
        raw = bytes([0]) + row1 + bytes([2]) + row2_delta
        png = (
            sig
            + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 2, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        expect = sum(row1) + sum(a + b for a, b in zip(row1, row2_delta))
        assert _decode_png(png) == (1, 2, 4, expect)

    def test_rejects_corruption(self):
        good = _encode_png(7)
        assert _decode_png(None) == (None,) * 4
        assert _decode_png(b"\x89PNGnope") == (None,) * 4
        assert _decode_png(good[:-5]) == (None,) * 4  # truncated IEND
        flipped = bytearray(good)
        flipped[30] ^= 0xFF  # body corruption -> CRC mismatch
        assert _decode_png(bytes(flipped)) == (None,) * 4
        # bit depth 16 is declared unsupported, not misdecoded
        import struct as _s
        import zlib

        def chunk(t, b):
            return (
                _s.pack(">I", len(b)) + t + b
                + _s.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        png16 = (
            sig
            + chunk(b"IHDR", _s.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes([0, 0, 0])))
            + chunk(b"IEND", b"")
        )
        assert _decode_png(png16) == (None,) * 4


def _scalar_unfilter_pix_sum(raw, w, h, channels):
    """Per-byte reference reconstruction (the pre-vectorization
    formulation) — the oracle for the numpy scanline paths."""
    from zikeiretsu_rs_spark.operators.multimodal import _paeth

    stride = w * channels
    pix_sum = 0
    prev = bytearray(stride)
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        for x in range(stride):
            left = line[x - channels] if x >= channels else 0
            up = prev[x]
            ul = prev[x - channels] if x >= channels else 0
            if ftype == 1:
                line[x] = (line[x] + left) & 0xFF
            elif ftype == 2:
                line[x] = (line[x] + up) & 0xFF
            elif ftype == 3:
                line[x] = (line[x] + (left + up) // 2) & 0xFF
            elif ftype == 4:
                line[x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        pix_sum += sum(line)
        prev = line
    return pix_sum


class TestPngVectorizedUnfilter:
    """The numpy scanline reconstruction (cumsum Sub, whole-row Up,
    scalar Average/Paeth) must be byte-equivalent to the per-byte
    reference on adversarial filter mixes and all channel counts."""

    def _png(self, w, h, channels, seed, ftype_fn):
        import random
        import struct as _s
        import zlib

        from zikeiretsu_rs_spark.operators.multimodal import (
            _PNG_SIG,
            _paeth,
            _png_chunk,
        )

        rng = random.Random(seed)
        color = {1: 0, 3: 2, 4: 6}[channels]
        stride = w * channels
        img = [[rng.randrange(256) for _ in range(stride)] for _ in range(h)]
        filtered = bytearray()
        prev = [0] * stride
        for y in range(h):
            ftype = ftype_fn(y)
            filtered.append(ftype)
            row = img[y]
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                up = prev[x]
                ul = prev[x - channels] if x >= channels else 0
                pred = [0, left, up, (left + up) // 2, _paeth(left, up, ul)][
                    ftype
                ]
                filtered.append((row[x] - pred) & 0xFF)
            prev = row
        ihdr = _s.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        png = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
            + _png_chunk(b"IEND", b"")
        )
        return png, bytes(filtered), sum(sum(r) for r in img)

    @pytest.mark.parametrize("channels", [1, 3, 4])
    @pytest.mark.parametrize(
        "ftype_fn,label",
        [
            (lambda y: y % 5, "cycling"),
            (lambda y: 4, "all-paeth"),
            (lambda y: 3, "all-average"),
            (lambda y: 1, "all-sub"),
            (lambda y: [4, 1, 4, 3, 2, 0][y % 6], "mixed"),
        ],
        ids=lambda v: v if isinstance(v, str) else "",
    )
    def test_matches_scalar_reference(self, channels, ftype_fn, label):
        w, h = 19, 11
        png, filtered, want = self._png(w, h, channels, hash(label), ftype_fn)
        assert _decode_png(png) == (w, h, channels, want)
        assert (
            _scalar_unfilter_pix_sum(filtered, w, h, channels) == want
        )

    def test_encoder_matches_scalar_reference_bytes(self):
        """The vectorized encoder emits byte-for-byte the same PNG the
        per-byte formulation produced (same filters, same deltas)."""
        import struct as _s
        import zlib

        from zikeiretsu_rs_spark.operators.multimodal import (
            _PNG_SIG,
            _paeth,
            _png_chunk,
            _png_dims,
        )

        for media_id in (0, 3, 17, 123, 2**33 + 5):
            w, h = _png_dims(media_id)
            bpp = 3
            i = 0
            rows = []
            for _y in range(h):
                row = bytearray(w * bpp)
                for x in range(w * bpp):
                    row[x] = (media_id * 131 + i * 7) % 256
                    i += 1
                rows.append(row)
            filtered = bytearray()
            prev = bytearray(w * bpp)
            for y, row in enumerate(rows):
                ftype = (media_id + y) % 5
                filtered.append(ftype)
                for x in range(w * bpp):
                    left = row[x - bpp] if x >= bpp else 0
                    up = prev[x]
                    ul = prev[x - bpp] if x >= bpp else 0
                    pred = [
                        0, left, up, (left + up) // 2, _paeth(left, up, ul)
                    ][ftype]
                    filtered.append((row[x] - pred) & 0xFF)
                prev = row
            ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            want = (
                _PNG_SIG
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
                + _png_chunk(b"IEND", b"")
            )
            assert _encode_png(media_id) == want


class TestPngCodecBoundaries:
    @settings(max_examples=100, deadline=None)
    @given(st.binary(max_size=128))
    def test_never_crashes_on_garbage(self, payload):
        assert len(_decode_png(payload)) == 4

    def test_spark_synthesize_decode(self, spark):
        df = spark.range(0, 20).select(F.col("id").alias("doc_id"))
        media = multimodal.synthesize_png_media(df, "doc_id")
        out = {r["media_id"]: r for r in multimodal.decode_png(media).collect()}
        assert len(out) == 20
        for mid, r in out.items():
            w, h = _png_dims(mid)
            assert (r["width"], r["height"], r["channels"], r["ok"]) == (
                w, h, 3, True,
            )


class TestUnsupportedCodecBoundary:
    def test_reports_not_decodable(self, spark):
        rows = [(1, "image", bytearray(b"\xff\xd8\xff\xe0fakejpeg"), "image/jpeg")]
        media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
        out = multimodal.decode_unsupported(media).collect()
        assert len(out) == 1
        r = out[0]
        assert not r["ok"] and r["width"] is None and r["n_bytes"] == 12


class TestAudioFrameFeatures:
    def test_frame_math_on_known_signal(self, spark):
        from zikeiretsu_rs_spark.operators import multimodal
        import math

        media = multimodal.synthesize_wav_media(
            spark.createDataFrame([(5,)], ["doc_id"]), "doc_id"
        )
        rows = {
            r["frame_idx"]: r
            for r in multimodal.audio_frame_features(media, frame_len=32)
            .collect()
        }
        samples = multimodal._wav_samples(5)
        n = len(samples)
        assert len(rows) == (n + 31) // 32
        for f, r in rows.items():
            fr = samples[f * 32 : (f + 1) * 32]
            assert r["n_in_frame"] == len(fr)
            assert r["rms"] == round(
                math.sqrt(sum(v * v for v in fr) / len(fr)), 6
            )
            zc = sum(
                1
                for i in range(1, len(fr))
                if (fr[i] >= 0) != (fr[i - 1] >= 0)
            )
            assert r["n_zero_cross"] == zc

    def test_invalid_payload_skipped(self, spark):
        from pyspark.sql import types as T
        from zikeiretsu_rs_spark.operators import multimodal

        schema = T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )
        df = spark.createDataFrame(
            [(1, bytearray(b"not a wav")), (2, None)], schema
        )
        assert multimodal.audio_frame_features(df).count() == 0


class TestGifCodec:
    """Real GIF89a codec: LZW entropy coding with variable code widths,
    extension-block walking, palette mapping — the last
    no-native-library format worth a real decoder."""

    @pytest.mark.parametrize("media_id", [0, 1, 7, 16, 17, 187, 12345])
    def test_roundtrip(self, media_id):
        import numpy as np

        w, h = multimodal._gif_dims(media_id)
        payload = multimodal._encode_gif(media_id)
        idx = multimodal._gif_indices(media_id, w * h)
        pal = np.frombuffer(
            multimodal._gif_palette_bytes(), dtype=np.uint8
        ).reshape(256, 3)
        assert multimodal._decode_gif(payload) == (
            w,
            h,
            3,
            int(idx.sum(dtype=np.int64)),
            int(pal[idx].sum(dtype=np.int64)),
        )
        # container structure: magic, GCT flag, GCE present, trailer
        assert payload[:6] == b"GIF89a"
        assert payload[10] & 0x80  # global color table flag
        assert payload[13 + 768] == 0x21  # extension introducer
        assert payload[-1] == 0x3B

    def test_lzw_width_growth_is_exercised(self):
        # every fixture has >= 16*12=192 pixels -> decoder table crosses
        # 512 entries only for larger ones; check a big one explicitly
        w, h = multimodal._gif_dims(16)  # 32 x ...
        assert w * h > 300  # enough pixels to push past 9-bit codes

    def test_lzw_kwkwk_and_table_reset(self):
        import numpy as np

        # KwKwK: run of identical symbols forces the code==len(table) path
        run = np.zeros(9000, dtype=np.uint8)
        assert multimodal._lzw_decompress(
            multimodal._lzw_compress(run)
        ) == bytes(run)
        # random data grows the table to 4096 and forces a CLEAR reset
        rng = np.random.RandomState(3)
        big = rng.randint(0, 256, 30000).astype(np.uint8)
        assert multimodal._lzw_decompress(
            multimodal._lzw_compress(big)
        ) == bytes(big)

    @given(st.binary(min_size=0, max_size=64))
    @settings(max_examples=60, deadline=None)
    def test_never_crashes_on_garbage(self, payload):
        multimodal._decode_gif(payload)
        multimodal._lzw_decompress(payload)

    @pytest.mark.parametrize(
        "mutate",
        [
            lambda p: p[:20],  # truncated in the color table
            lambda p: b"GIF90a" + p[6:],  # bad magic
            lambda p: p[: len(p) // 2],  # truncated mid-LZW-stream
            # clobber the image-descriptor introducer (fixed offset:
            # header 13 + GCT 768 + GCE 8)
            lambda p: p[: 13 + 768 + 8] + b"\x2d" + p[13 + 768 + 8 + 1 :],
        ],
    )
    def test_rejects_corruption(self, mutate):
        p = multimodal._encode_gif(42)
        assert multimodal._decode_gif(mutate(p))[0] is None

    def test_corrupt_lzw_stream_rejected(self):
        p = bytearray(multimodal._encode_gif(42))
        # flip bits deep inside the LZW data (after GCT + GCE + desc)
        off = 13 + 768 + 8 + 10 + 5
        p[off] ^= 0xFF
        p[off + 1] ^= 0xFF
        out = multimodal._decode_gif(bytes(p))
        # either cleanly rejected or decoded to a checksum != expected;
        # must never raise
        import numpy as np

        w, h = multimodal._gif_dims(42)
        expect = int(multimodal._gif_indices(42, w * h).sum(dtype=np.int64))
        assert out[0] is None or out[3] != expect

    def test_local_color_table_overrides_global(self):
        import numpy as np

        # hand-build a 2x2 GIF with a local table and no global one
        idx = np.array([0, 1, 2, 3], dtype=np.uint8)
        lzw = multimodal._lzw_compress(idx, 2)
        p = bytearray(b"GIF89a")
        p += struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)  # no GCT
        p += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x81)  # LCT: 4 entries
        p += bytes((10, 0, 0, 20, 0, 0, 30, 0, 0, 40, 0, 0))  # 4 entries
        p += bytes((2,))
        p += bytes((len(lzw),)) + lzw + b"\x00\x3b"
        w, h, ch, isum, rsum = multimodal._decode_gif(bytes(p))
        assert (w, h, ch) == (2, 2, 3)
        assert isum == 6
        assert rsum == 10 + 20 + 30 + 40


class TestGifSparkPlumbing:
    def test_synthesize_decode(self, spark):
        import numpy as np

        df = spark.range(0, 24).withColumnRenamed("id", "doc_id")
        out = (
            multimodal.decode_gif(
                multimodal.synthesize_gif_media(df, "doc_id")
            )
            .orderBy("media_id")
            .collect()
        )
        assert len(out) == 24
        pal = np.frombuffer(
            multimodal._gif_palette_bytes(), dtype=np.uint8
        ).reshape(256, 3)
        for r in out:
            w, h = multimodal._gif_dims(r["media_id"])
            idx = multimodal._gif_indices(r["media_id"], w * h)
            assert r["ok"] and (r["width"], r["height"]) == (w, h)
            assert r["idx_sum"] == int(idx.sum(dtype=np.int64))
            assert r["rgb_sum"] == int(pal[idx].sum(dtype=np.int64))

    def test_bad_payload_rows_surface(self, spark):
        rows = [(1, "image", bytearray(b"nope"), "image/gif"), (2, "image", None, "image/gif")]
        df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        out = {r["media_id"]: r for r in multimodal.decode_gif(df).collect()}
        assert not out[1]["ok"] and not out[2]["ok"]
        assert out[1]["width"] is None


class TestGifInterlace:
    def test_interlaced_image_deinterlaces(self):
        import numpy as np

        w, h = multimodal._gif_dims(5)
        idx = multimodal._gif_indices(5, w * h).reshape(h, w)
        order = multimodal._gif_interlace_order(h)
        stored = idx[order].reshape(-1)  # rows in transmission order
        lzw = multimodal._lzw_compress(stored)
        p = bytearray(b"GIF89a")
        p += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
        p += multimodal._gif_palette_bytes()
        p += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
        p += bytes((8,))
        for off in range(0, len(lzw), 255):
            c = lzw[off : off + 255]
            p += bytes((len(c),)) + c
        p += b"\x00\x3b"
        out = multimodal._decode_gif(bytes(p))
        # de-interlaced result must equal the progressive encoding's
        assert out == multimodal._decode_gif(multimodal._encode_gif(5))

    def test_interlace_order_is_a_permutation(self):
        for h in (1, 2, 3, 7, 8, 9, 22):
            order = multimodal._gif_interlace_order(h)
            assert sorted(order) == list(range(h))
