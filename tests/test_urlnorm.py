"""Canonicalizer + hash: Spark expression == pure-Python twin."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_spark import urlnorm

URLS = [
    "https://book.douban.com",
    "HTTP://Host000.Example.Test:80/Path?Q=1#frag",
    "https://a.b:443/",
    "https://a.b:8443/x",
    "https://www.douban.com/group/topic/abc123/",
    "https://host001.example.test/detail/7",
    "ftp://odd.scheme/x",
    "no-scheme-at-all",
    "https://h/#only-frag",
    "https://h/path#frag1#frag2",
]


def test_canon_parity_spark_vs_python(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "u string").select(
        "u",
        urlnorm.canon_col(F.col("u")).alias("c"),
        urlnorm.host_col(F.col("u")).alias("h"),
    )
    for r in df.collect():
        assert r.c == urlnorm.canon_py(r.u), r.u
        assert r.h == urlnorm.host_py(r.u), r.u


def test_canon_idempotent():
    for u in URLS:
        once = urlnorm.canon_py(u)
        assert urlnorm.canon_py(once) == once


def test_xxhash64_matches_spark(spark):
    strs = ["", "a", "abc|GET", "阳台" * 40, "x" * 31, "y" * 32, "z" * 33]
    df = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    for r in df.collect():
        assert urlnorm.xxhash64_py(r.s.encode("utf-8")) == r.h, repr(r.s)


def test_url_hash_parity(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "u string")
    df = df.select(
        "u",
        urlnorm.url_hash_col(urlnorm.canon_col(F.col("u")), F.lit("GET")).alias("h"),
    )
    for r in df.collect():
        assert urlnorm.url_hash_py(urlnorm.canon_py(r.u)) == r.h


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_xxhash64_pure_python_total(data):
    # never raises, always int64
    v = urlnorm.xxhash64_py(data)
    assert -(1 << 63) <= v < (1 << 63)
