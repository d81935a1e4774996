"""Unit tests for anchors.focused_priority — hit counting, the URL
boost and its cap, the empty-lexicon guard, and the single
target-keyed shuffle.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import anchors  # noqa: E402

KW = ("spark", "crawler", "data")


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "target string, anchor string")
    out = anchors.focused_priority(df, keywords=KW, **kw)
    return {r["target"]: r.asDict() for r in out.collect()}


def test_scoring_and_url_boost(spark):
    rows = [
        ("https://t/a", "Spark tutorial"),          # hit (case-free)
        ("https://t/a", "cat gallery"),             # miss
        ("https://t/a", "crawler data notes"),      # hit
        ("https://t/spark-data", "plain link"),     # miss, url has 2 kw
    ]
    got = _run(spark, rows)
    a = got["https://t/a"]
    assert (a["n_refs"], a["n_hit_refs"], a["url_hits"]) == (3, 2, 0)
    assert a["focus_micro"] == 666_666
    b = got["https://t/spark-data"]
    assert (b["n_refs"], b["n_hit_refs"], b["url_hits"]) == (1, 0, 2)
    assert b["focus_micro"] == 500_000  # 0 + 250k * 2


def test_url_hit_cap(spark):
    rows = [("https://spark-crawler-data/spark", "x")]
    got = _run(spark, rows, max_url_hits=2)
    assert got["https://spark-crawler-data/spark"]["focus_micro"] == 500_000


def test_empty_lexicon_rejected(spark):
    df = spark.createDataFrame([("t", "a")], "target string, anchor string")
    with pytest.raises(ValueError):
        anchors.focused_priority(df, keywords=())


def test_single_target_keyed_shuffle(spark):
    df = spark.createDataFrame([("t", "a")], "target string, anchor string")
    plan = anchors.focused_priority(df, keywords=KW)._jdf.queryExecution() \
        .executedPlan().toString()
    exchanges = [l for l in plan.splitlines()
                 if "Exchange hashpartitioning" in l]
    assert len(exchanges) == 1 and "target" in exchanges[0], plan
