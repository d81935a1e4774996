"""Domain-blocklist tagging (hoststats.tag_blocked): label-boundary
suffix semantics, single-label hosts, and the no-corpus-shuffle plan
shape (broadcast joins only)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.functions import hoststats  # noqa: E402


def test_suffix_semantics(spark):
    rows = [
        (1, "x.ads.example.com", True),   # subdomain of listed domain
        (2, "notads.com", False),         # substring but not label suffix
        (3, "ads.com", True),             # exact match
        (4, "example.com", False),        # parent of a listed subdomain
        (5, "deep.sub.tracker.net", True),
        (6, "com", False),                # single label, unlisted
        (7, "net", True),                 # single label, listed
        (8, "tracker.net.evil.org", False),  # listed domain in the middle
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in rows], "doc_id long, host string"
    )
    bl = spark.createDataFrame(
        [("ads.com",), ("tracker.net",), ("ads.example.com",), ("net",)],
        "domain string",
    )
    got = {r.doc_id: r.blocked for r in hoststats.tag_blocked(df, bl).collect()}
    for i, h, want in rows:
        assert got[i] == want, (i, h, got[i])


def test_host_suffixes_column(spark):
    df = spark.createDataFrame([("a.b.c",), ("solo",)], "host string")
    got = [r[0] for r in df.select(hoststats.host_suffixes("host")).collect()]
    assert got[0] == ["a.b.c", "b.c", "c"]
    assert got[1] == ["solo"]


def test_no_corpus_shuffle(spark):
    """The corpus side must reach the tag via broadcast joins only —
    no Exchange on the full input (the 100 TB contract in the
    docstring)."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".ex.com")).alias(
            "host"
        ),
    )
    bl = spark.createDataFrame([("ex.com",)], "domain string")
    plan = hoststats.tag_blocked(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed are broadcasts and the distinct over
    # the (tiny) hit-id set; the corpus scan itself must not shuffle
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            assert "__bid" in line, line


def test_property_random_hosts(spark):
    """Batch property check vs a pure-Python suffix-match oracle over
    random hosts and a random blocklist (seeded)."""
    import random

    rng = random.Random(7)
    labels = ["a", "b", "co", "example", "ads", "x1", "tracker"]

    def mk_host():
        return ".".join(
            rng.choice(labels) for _ in range(rng.randrange(1, 5))
        )

    hosts = [mk_host() for _ in range(300)]
    block = sorted({mk_host() for _ in range(12)})

    def py_blocked(h):
        parts = h.split(".")
        sufs = {".".join(parts[i:]) for i in range(len(parts))}
        return bool(sufs & set(block))

    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, host string"
    )
    bl = spark.createDataFrame([(d,) for d in block], "domain string")
    got = {r.doc_id: r.blocked for r in hoststats.tag_blocked(df, bl).collect()}
    for i, h in enumerate(hosts):
        assert got[i] == py_blocked(h), (i, h)
