"""S7/S8 fetch-option twins: deterministic, well-distributed, and
shaped like the reference's proxy rotation / UA generators."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crawler_spark import fetchopts

PROXIES = ["http://p0:8080", "http://p1:8080", "http://p2:8080"]


def _urls(spark, n=600):
    return spark.range(n).select(
        F.format_string("https://host%03d.example.test/p/%d", F.col("id") % 50, F.col("id")).alias("url")
    )


def test_proxy_deterministic_and_uniform(spark):
    df = _urls(spark).select("url", fetchopts.proxy_col(F.col("url"), PROXIES).alias("p"))
    a = {r.url: r.p for r in df.collect()}
    b = {r.url: r.p for r in df.collect()}
    assert a == b  # same URL -> same proxy, every run
    counts = df.groupBy("p").count().collect()
    assert len(counts) == len(PROXIES)
    lo, hi = min(r["count"] for r in counts), max(r["count"] for r in counts)
    assert hi < 2 * lo  # roughly round-robin-uniform

    empty = _urls(spark).select(fetchopts.proxy_col(F.col("url"), []).alias("p"))
    assert all(r.p is None for r in empty.collect())


def test_user_agent_shape_and_coverage(spark):
    df = _urls(spark).select("url", fetchopts.user_agent_col(F.col("url")).alias("ua"))
    rows = df.collect()
    assert all(r.ua and r.ua.startswith("Mozilla/5.0") for r in rows)
    # every family appears across 600 URLs
    fams = set()
    for r in rows:
        for i, marker in enumerate(("Chrome/1", "Firefox/", "Version/1", "OPR/", "Mobile Safari", "Mobile/15E148")):
            if marker in r.ua:
                fams.add(i)
    assert len(fams) >= 5
    # version slots filled with plausible numbers, no template braces left
    assert not any("{" in r.ua for r in rows)
    assert all(re.search(r"(Chrome|Firefox|Version|OPR)/1[0-2]\d", r.ua) for r in rows)
    # deterministic
    again = {r.url: r.ua for r in df.collect()}
    assert again == {r.url: r.ua for r in rows}
