"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride Spark as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas.  The decode libraries
(Pillow/ffmpeg/torchaudio) are NOT in this container, so the codec step
is stubbed two ways:

- ``decode_image_meta``: a *deterministic fake* decoder that parses the
  synthetic header written by ``fake_image``; real plumbing (schema,
  batching, partition sizing) — fake pixels.
- ``decode_image_real``: raises NotImplementedError with the exact
  production swap-in point documented.

The Spark-side contract (what actually matters at 100 TB): binary
payloads are *never* shuffled through Python row-by-row — mapInPandas
streams Arrow record batches; payload-heavy tables are written with
small row groups and read with ``spark.sql.files.maxPartitionBytes``
tuned so one partition ~ executor memory / 4.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FAKE_MAGIC = b"FIMG"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)


def fake_image(width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic synthetic payload: FIMG header + w*h*c filler."""
    header = FAKE_MAGIC + struct.pack("<III", width, height, channels)
    body = bytes((width * 31 + height * 17 + i) % 251 for i in range(min(64, width * height)))
    return header + body


def decode_image_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Adds ``meta struct<width,height,channels,n_bytes,codec>`` by
    parsing payload headers in Arrow batches (the deterministic stub)."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", IMAGE_META_SCHEMA)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for raw in pdf[bin_col]:
                raw = bytes(raw) if raw is not None else b""
                if raw[:4] == FAKE_MAGIC and len(raw) >= 16:
                    w, h, c = struct.unpack("<III", raw[4:16])
                    metas.append(
                        {"width": w, "height": h, "channels": c,
                         "n_bytes": len(raw), "codec": "fimg"}
                    )
                else:
                    metas.append(
                        {"width": None, "height": None, "channels": None,
                         "n_bytes": len(raw), "codec": "unknown"}
                    )
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def decode_image_real(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Production decode: swap the body of ``run`` for
    ``PIL.Image.open(io.BytesIO(raw))`` (or cv2.imdecode) keeping the
    same mapInPandas shape — batch in, batch out, schema fixed."""
    raise NotImplementedError(
        "image codec libraries not available in this environment; "
        "use decode_image_meta (deterministic stub) — same Spark plumbing"
    )


def resize_stub(df: DataFrame, target_w: int, target_h: int,
                bin_col: str = "payload") -> DataFrame:
    """Resize plumbing: rewrites the fake header to the target dims
    (production: actual resample in the same UDF shape)."""
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fixed = []
            for raw in pdf[bin_col]:
                raw = bytes(raw) if raw is not None else b""
                if raw[:4] == FAKE_MAGIC and len(raw) >= 16:
                    _, _, c = struct.unpack("<III", raw[4:16])
                    fixed.append(FAKE_MAGIC + struct.pack("<III", target_w, target_h, c) + raw[16:])
                else:
                    fixed.append(raw)
            pdf = pdf.copy()
            pdf[bin_col] = fixed
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


FAKE_AUDIO_MAGIC = b"FAUD"

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)


def fake_audio(sample_rate: int, n_samples: int, n_channels: int = 1) -> bytes:
    """Deterministic synthetic audio payload: FAUD header + sample filler
    (2 bytes/sample, capped — headers are what the plumbing tests need)."""
    header = FAKE_AUDIO_MAGIC + struct.pack("<IIQ", sample_rate, n_channels, n_samples)
    body = bytes((sample_rate + i * 7) % 251 for i in range(min(128, 2 * n_samples)))
    return header + body


def decode_audio_meta(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Adds ``ameta struct<sample_rate,n_channels,n_samples,duration_ms,
    codec>`` by parsing payload headers in Arrow batches.  Production
    swap-in: soundfile/torchaudio header read in the same mapInPandas
    shape (batch in, batch out, schema fixed)."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("ameta", AUDIO_META_SCHEMA)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for raw in pdf[bin_col]:
                raw = bytes(raw) if raw is not None else b""
                if raw[:4] == FAKE_AUDIO_MAGIC and len(raw) >= 20:
                    sr, ch, ns = struct.unpack("<IIQ", raw[4:20])
                    metas.append(
                        {"sample_rate": sr, "n_channels": ch, "n_samples": ns,
                         "duration_ms": (ns * 1000) // max(sr, 1), "codec": "faud"}
                    )
                else:
                    metas.append(
                        {"sample_rate": None, "n_channels": None,
                         "n_samples": None, "duration_ms": None,
                         "codec": "unknown"}
                    )
            pdf = pdf.copy()
            pdf["ameta"] = metas
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resample_stub(df: DataFrame, target_rate: int, bin_col: str = "payload") -> DataFrame:
    """Audio resample plumbing: rewrites the header to the target rate
    with n_samples rescaled by the rate ratio in exact integer arithmetic
    (production: actual polyphase resample in the same UDF shape)."""
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fixed = []
            for raw in pdf[bin_col]:
                raw = bytes(raw) if raw is not None else b""
                if raw[:4] == FAKE_AUDIO_MAGIC and len(raw) >= 20:
                    sr, ch, ns = struct.unpack("<IIQ", raw[4:20])
                    new_ns = (ns * target_rate) // max(sr, 1)
                    fixed.append(
                        FAKE_AUDIO_MAGIC
                        + struct.pack("<IIQ", target_rate, ch, new_ns)
                        + raw[20:]
                    )
                else:
                    fixed.append(raw)
            pdf = pdf.copy()
            pdf[bin_col] = fixed
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_n: int, bin_col: str = "payload",
                      id_col: str = "media_id") -> DataFrame:
    """Video frame sampling plumbing: emits (media_id, frame_no, frame)
    rows — 1->N row expansion through mapInPandas (production: ffmpeg
    keyframe extraction in the same shape)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, raw in zip(pdf[id_col], pdf[bin_col]):
                raw = bytes(raw) if raw is not None else b""
                n_frames = max(1, len(raw) // 16)
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(raw[fno * 16 : (fno + 1) * 16])
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(run, schema=out_schema)


def dhash64(df: DataFrame, bin_col: str = "payload", out_col: str = "dhash") -> DataFrame:
    """Difference-hash perceptual image fingerprint (the classic dHash:
    bit_i = pixel_i < pixel_{i+1}, gradient direction per adjacent
    pair), emitted as a 16-hex-char string so no engine has to carry an
    unsigned 64-bit code through a signed long.  On the deterministic
    FIMG stub the "pixels" are the 64 body bytes after the 16-byte
    header (63 comparison bits, top bit 0); the production swap decodes
    with PIL, grayscale-resizes to 9x8, and applies the same bit rule —
    the UDF shape, Arrow batching, and output column are identical.
    Integer comparisons only, so the hash is bit-exact across engines.
    Image near-dup then reduces to the text machinery: exact dedup =
    groupBy(dhash); near-dup = Hamming blocking exactly like simhash
    (functions/dedup.py) on the same 64-bit code.  Scale: one corpus
    pass, scan-local, no shuffle.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for raw in pdf[bin_col]:
                raw = bytes(raw) if raw is not None else b""
                body = raw[16:16 + 64]
                if raw[:4] != FAKE_MAGIC or len(body) < 64:
                    hashes.append(None)
                    continue
                v = 0
                for i in range(63):
                    if body[i] < body[i + 1]:
                        v |= 1 << (62 - i)
                hashes.append(format(v, "016x"))
            pdf = pdf.copy()
            pdf[out_col] = hashes
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
