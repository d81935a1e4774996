"""Real-codec multimodal paths (r4): native PNG/JPEG meta parsing and
stdlib-wave WAV decode/resample run against REAL container bytes
generated in-test (zlib PNG encoder, wave PCM16 writer); the Pillow
fallback test skips when the library is absent."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from crawler_spark.functions import multimodal as mm


def make_png(width: int, height: int, gray: int = 128) -> bytes:
    """Valid 8-bit grayscale PNG via stdlib zlib (spec: RFC 2083)."""
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    scanlines = b"".join(b"\x00" + bytes([gray]) * width for _ in range(height))
    return (
        mm.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def make_jpeg_header(width: int, height: int, channels: int = 3) -> bytes:
    """Minimal JPEG segment chain up to SOF0 (ITU T.81 B.2.2) — enough
    for any header-walking dimension parser."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof_body = struct.pack(">BHHB", 8, height, width, channels) + b"\x01\x11\x00" * channels
    sof0 = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_body)) + sof_body
    return b"\xff\xd8" + app0 + sof0


def make_wav(sample_rate: int, n_samples: int, n_channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        # a deterministic ramp so resampling has real signal to move
        frames = b"".join(
            struct.pack("<h", (i * 37) % 20000 - 10000) * n_channels
            for i in range(n_samples)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def test_png_and_jpeg_meta_pure_parsers():
    assert mm.png_meta(make_png(17, 9)) == (17, 9, 1)
    assert mm.png_meta(b"not a png") is None
    assert mm.jpeg_meta(make_jpeg_header(31, 22, 3)) == (31, 22, 3)
    assert mm.jpeg_meta(make_png(4, 4)) is None


def test_decode_image_real_on_real_containers(spark):
    rows = [
        (1, make_png(17, 9)),
        (2, make_jpeg_header(31, 22)),
        (3, b"garbage bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r.meta for r in mm.decode_image_real(df).collect()}
    assert (out[1].width, out[1].height, out[1].channels, out[1].codec) == (17, 9, 1, "png")
    assert (out[2].width, out[2].height, out[2].channels, out[2].codec) == (31, 22, 3, "jpeg")
    assert out[3].codec == "unknown" and out[3].n_bytes == len(b"garbage bytes")


def test_decode_image_real_pil_fallback(spark):
    Image = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    Image.new("RGB", (5, 7)).save(buf, format="BMP")
    df = spark.createDataFrame([(1, buf.getvalue())], "media_id long, payload binary")
    meta = mm.decode_image_real(df).collect()[0].meta
    assert (meta.width, meta.height, meta.channels, meta.codec) == (5, 7, 3, "bmp")


def test_decode_audio_real_wav(spark):
    rows = [(1, make_wav(8000, 4000)), (2, make_wav(16000, 1600, 2)), (3, b"junk")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r.ameta for r in mm.decode_audio_real(df).collect()}
    assert (out[1].sample_rate, out[1].n_samples, out[1].n_channels) == (8000, 4000, 1)
    assert out[1].duration_ms == 500
    assert (out[2].sample_rate, out[2].n_channels) == (16000, 2)
    assert out[3].codec == "unknown"


def test_resample_wav_real_changes_rate_and_duration(spark):
    src = make_wav(8000, 4000)  # 500 ms
    df = spark.createDataFrame([(1, src), (2, b"passthrough")],
                               "media_id long, payload binary")
    out = {r.media_id: bytes(r.payload)
           for r in mm.resample_wav_real(df, 16000).collect()}
    with wave.open(io.BytesIO(out[1])) as wf:
        assert wf.getframerate() == 16000
        assert wf.getnframes() == 8000  # same 500 ms at the new rate
        assert wf.getnchannels() == 1 and wf.getsampwidth() == 2
        # real interpolation: the ramp's values are preserved at the
        # anchor points (sample 2k in the output ~ sample k in the source)
        y = wf.readframes(10)
    with wave.open(io.BytesIO(src)) as wf_src:
        x = wf_src.readframes(5)
    assert struct.unpack("<h", y[0:2])[0] == struct.unpack("<h", x[0:2])[0]
    assert struct.unpack("<h", y[4:6])[0] == struct.unpack("<h", x[2:4])[0]
    assert out[2] == b"passthrough"
