"""resize_stub plumbing (VERDICT r2 #6 — the one op with zero coverage):
header rewrite to target dims, body carried, non-fake payloads passed
through untouched, decode_image_meta reads the resized header back."""

from __future__ import annotations

from crawler_spark.functions import multimodal as mm


def test_resize_stub_rewrites_header_and_keeps_body(spark):
    rows = [
        (0, mm.fake_image(640, 480, 3)),
        (1, mm.fake_image(8, 8, 1)),
        (2, b"not-an-image"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r.payload for r in mm.resize_stub(df, 32, 24).collect()}

    import struct

    for i, original in rows[:2]:
        raw = bytes(out[i])
        assert raw[:4] == mm.FAKE_MAGIC
        w, h, c = struct.unpack("<III", raw[4:16])
        # closed form: target dims, channels preserved, body untouched
        assert (w, h) == (32, 24)
        assert c == struct.unpack("<III", original[4:16])[2]
        assert raw[16:] == original[16:]
    assert bytes(out[2]) == b"not-an-image"  # passthrough
    assert bytes(out[3]) == b""  # null -> empty, never a crash

    meta = {
        r.doc_id: r.meta
        for r in mm.decode_image_meta(mm.resize_stub(df, 32, 24)).collect()
    }
    assert (meta[0].width, meta[0].height, meta[0].channels) == (32, 24, 3)
    assert meta[1].channels == 1
    assert meta[2].codec == "unknown"


def test_dhash64_bits_and_null_safety(spark):
    import crawler_spark.functions.multimodal as mm

    rows = [
        (0, mm.fake_image(40, 40)),
        (1, mm.fake_image(40, 40)),   # identical image -> identical hash
        (2, mm.fake_image(41, 40)),   # different image -> (here) different hash
        (3, b"not-an-image"),
        (4, None),
        (5, mm.fake_image(40, 40)[:30]),  # truncated body -> None
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.dhash for r in mm.dhash64(df).collect()}

    # pure-python recompute of the bit rule on the stub pixels
    def py_hash(raw: bytes):
        body = raw[16:80]
        if raw[:4] != mm.FAKE_MAGIC or len(body) < 64:
            return None
        v = 0
        for i in range(63):
            if body[i] < body[i + 1]:
                v |= 1 << (62 - i)
        return format(v, "016x")

    for i, raw in rows:
        assert got[i] == (py_hash(bytes(raw)) if raw is not None else None), i
    assert got[0] == got[1]
    assert got[0] != got[2]
    assert got[3] is None and got[4] is None and got[5] is None
    # 16 lowercase hex chars, top bit always clear (63-bit code)
    assert len(got[0]) == 16 and int(got[0], 16) < 1 << 63
