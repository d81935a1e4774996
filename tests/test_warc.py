"""Unit tests for sources/warc.py: binary-safe Content-Length framing
(bodies containing the record separator bytes), multi-record / multi-
file reads, non-response record passthrough, truncation detection, and
byte-identical rewrite determinism.
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.sources import warc  # noqa: E402


def _write(spark, tmpdir, rows, parts=2):
    df = spark.createDataFrame(rows, ["url", "warc_date", "body"]).repartition(
        parts, "url"
    )
    warc.write_warc(df, str(tmpdir))
    return sorted(glob.glob(os.path.join(str(tmpdir), "*.warc")))


def test_roundtrip_binary_safe(spark, tmp_path):
    # bodies deliberately contain CRLFCRLF, bare header-lookalikes, and
    # non-UTF8 bytes: only Content-Length framing survives this.
    rows = [
        ("http://a/1", "2026-01-01T00:00:00Z", b"plain"),
        ("http://a/2", "2026-01-01T00:00:00Z", b"x\r\n\r\nWARC/1.0\r\ny"),
        ("http://a/3", "2026-01-01T00:00:00Z", bytes(range(256))),
        ("http://a/4", "2026-01-01T00:00:00Z", b""),
    ]
    _write(spark, tmp_path, rows)
    got = {
        r["target_uri"]: bytes(r["body"])
        for r in warc.read_warc(spark, str(tmp_path)).collect()
    }
    assert got == {u: b for u, _, b in rows}
    rec = warc.read_warc(spark, str(tmp_path)).collect()[0]
    assert rec["warc_type"] == "response"
    assert rec["http_status"] == 200
    assert rec["content_type"] == "text/html"


def test_write_is_deterministic(spark, tmp_path):
    rows = [
        (f"http://h{i % 3}/d/{i}", "2026-01-01T00:00:00Z", f"body{i}".encode())
        for i in range(20)
    ]
    d1, d2 = tmp_path / "a", tmp_path / "b"
    f1 = _write(spark, d1, rows, parts=3)
    f2 = _write(spark, d2, rows, parts=3)
    assert [os.path.basename(p) for p in f1] == [os.path.basename(p) for p in f2]
    for p1, p2 in zip(f1, f2):
        assert open(p1, "rb").read() == open(p2, "rb").read()


def test_truncated_record_raises(spark, tmp_path):
    _write(spark, tmp_path, [("http://a/1", "2026-01-01T00:00:00Z", b"abcdef")],
           parts=1)
    (path,) = glob.glob(os.path.join(str(tmp_path), "*.warc"))
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-10])
    with pytest.raises(Exception, match="truncated"):
        warc.read_warc(spark, str(tmp_path)).collect()


def test_non_response_record_passthrough(spark, tmp_path):
    body = b"software: graft"
    rec = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Record-ID: <urn:x:1>\r\n"
        b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode() + body + b"\r\n\r\n"
    )
    p = tmp_path / "info.warc"
    p.write_bytes(rec)
    (row,) = warc.read_warc(spark, str(tmp_path)).collect()
    assert row["warc_type"] == "warcinfo"
    assert row["http_status"] == 0
    assert bytes(row["body"]) == body
