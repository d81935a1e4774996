"""Unit tests for textops.soft404_detect — the weighted vote (strong
signal alone convicts, short-body alone never does), phrase and title
regexes, and the zero-shuffle plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402

LONG = "word " * 60


def _detect(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, title string, text string"
    )
    return {r["doc_id"]: r.asDict()
            for r in textops.soft404_detect(df).collect()}


def test_vote_weights(spark):
    got = _detect(
        spark,
        [
            (0, "404 Not Found", "Page Not Found sorry"),   # all 3
            (1, "Nice", LONG + "this page No Longer Available"),  # phrase
            (2, "ERROR", LONG),                              # title only
            (3, "Nice", "tiny stub body"),                   # short only
            (4, "Nice", LONG),                               # clean
            (5, "Oops 404", LONG),                           # title 404
        ],
    )
    assert got[0]["is_soft404"] and got[0]["score"] == 5
    assert got[1]["is_soft404"] and got[1]["phrase_hit"]
    assert got[2]["is_soft404"] and got[2]["title_hit"]
    assert not got[3]["is_soft404"] and got[3]["score"] == 1
    assert not got[4]["is_soft404"] and got[4]["score"] == 0
    assert got[5]["is_soft404"]


def test_phrases_case_insensitive(spark):
    for phrase in ("Page CANNOT be found", "page does not EXIST",
                   "NOTHING was found", "Error 404"):
        got = _detect(spark, [(0, "t", LONG + phrase)])
        assert got[0]["phrase_hit"], phrase


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "t", "b")],
                               "doc_id long, title string, text string")
    plan = textops.soft404_detect(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
