"""Closed-form unit tests for snapshot differencing, benchmark
decontamination, and the SURT key (the crawl-archive trio added in
round 3)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.functions import dedup, snapshots  # noqa: E402
from crawler_spark.urlnorm import surt_col  # noqa: E402


def test_snapshot_diff_closed_form(spark):
    old = spark.createDataFrame(
        [("a", "f1"), ("b", "f2"), ("c", "f3")], ["url", "fp"]
    )
    new = spark.createDataFrame(
        [("a", "f1"), ("b", "XX"), ("d", "f4")], ["url", "fp"]
    )
    got = {
        r["url"]: r["status"]
        for r in snapshots.snapshot_diff(old, new).collect()
    }
    # 'a' unchanged -> dropped
    assert got == {"b": "changed", "c": "removed", "d": "added"}


def test_churn_by_key(spark):
    diff = spark.createDataFrame(
        [("h1", "added"), ("h1", "added"), ("h1", "changed"), ("h2", "removed")],
        ["host", "status"],
    )
    got = {
        r["host"]: (r["n_added"], r["n_removed"], r["n_changed"])
        for r in snapshots.churn_by_key(diff, "host", key_col="host").collect()
    }
    assert got == {"h1": (2, 0, 1), "h2": (0, 1, 0)}


def test_contaminated_docs_closed_form(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "see the quick brown fox jumps high"),  # 3 bench trigrams
            (2, "quick brown fox elsewhere"),           # 1 bench trigram
            (3, "nothing in common at all"),            # 0
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in dedup.contaminated_docs(corpus, bench, min_hits=1).collect()
    }
    assert got == {1: 3, 2: 1}
    got2 = {
        r["doc_id"]: r["n_hits"]
        for r in dedup.contaminated_docs(corpus, bench, min_hits=2).collect()
    }
    assert got2 == {1: 3}


def test_surt_col(spark):
    rows = spark.createDataFrame(
        [
            ("https://A.B.Example.COM/Path/X?q=1#frag",),
            ("http://host.org:80",),
        ],
        ["url"],
    ).select(surt_col(F.col("url")).alias("s")).collect()
    assert rows[0]["s"] == "com,example,b,a)/Path/X?q=1"
    assert rows[1]["s"] == "org,host)/"
