"""Unit tests for multimodal.sniff_mime — real magic-byte payloads for
every routed type, RIFF tag disambiguation, the O(1) slice (magic
buried PAST byte 12 must NOT match), and the octet-stream fallback.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import multimodal  # noqa: E402


def _sniff(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, content binary",
    )
    out = multimodal.sniff_mime(df)
    return {r["doc_id"]: r["mime"] for r in out.collect()}


def test_sniff_mime_magic_table(spark):
    got = _sniff(
        spark,
        [
            b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,
            b"\xff\xd8\xff\xe0" + b"JFIF",
            b"GIF89a" + b"\x00" * 8,
            b"GIF87a" + b"\x00" * 8,
            b"%PDF-1.7\n",
            b"\x1f\x8b\x08\x00gzip body",
            b"PK\x03\x04zipzip",
            b"<!DOCTYPE html><html>",
            b"<html><head>",
            b"<HTML><HEAD>",
        ],
    )
    assert got[0] == "image/png"
    assert got[1] == "image/jpeg"
    assert got[2] == "image/gif" and got[3] == "image/gif"
    assert got[4] == "application/pdf"
    assert got[5] == "application/gzip"
    assert got[6] == "application/zip"
    assert got[7] == "text/html" and got[8] == "text/html"
    assert got[9] == "text/html"


def test_sniff_mime_riff_tags_and_fallback(spark):
    got = _sniff(
        spark,
        [
            b"RIFF\x24\x00\x00\x00WAVEfmt ",
            b"RIFF\x10\x00\x00\x00WEBPVP8 ",
            b"RIFF\x10\x00\x00\x00AVI LIST",
            b"RIFF\x10\x00\x00\x00JUNK",  # RIFF with unknown tag
            b"plain text body, no magic",
            b"",
            b"\x00" * 20 + b"\x89PNG",  # magic past the 12-byte slice
        ],
    )
    assert got[0] == "audio/wav"
    assert got[1] == "image/webp"
    assert got[2] == "video/x-msvideo"
    assert got[3] == "application/octet-stream"
    assert got[4] == "application/octet-stream"
    assert got[5] == "application/octet-stream"
    assert got[6] == "application/octet-stream"


def test_sniff_mime_zero_shuffle(spark):
    df = spark.createDataFrame([(1, bytearray(b"%PDF"))],
                               "doc_id long, content binary")
    plan = multimodal.sniff_mime(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
