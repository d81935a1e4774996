"""Unit tests for textops.schema_types — the curated-enum guarantee,
JSON-LD spacing variants, og lowercasing, precedence, and the
zero-shuffle plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


def _run(spark, htmls):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "doc_id long, html string"
    )
    return {r["doc_id"]: r.asDict()
            for r in textops.schema_types(df).collect()}


def test_enum_guarantee_and_spacing(spark):
    got = _run(
        spark,
        [
            '{"@type": "Recipe"}',
            '{ "@type"  :  "HowTo" }',
            '{"@type": "MadeUpType"}',   # unknown -> null, not passthrough
            '{"@type": "JobPosting"}',
        ],
    )
    assert got[0]["schema_type"] == "Recipe"
    assert got[0]["content_class"] == "instruction"
    assert got[1]["schema_type"] == "HowTo"
    assert got[2]["schema_type"] is None
    assert got[2]["content_class"] == "unlabeled"
    assert got[3]["content_class"] == "commerce"


def test_og_fallback_lowercased_and_precedence(spark):
    got = _run(
        spark,
        [
            '<meta property="og:type" content="ARTICLE">',
            '<meta property="og:type" content="music.album">',
            '{"@type": "Product"}<meta property="og:type" content="article">',
        ],
    )
    assert got[0]["og_type"] == "article"
    assert got[0]["content_class"] == "article"
    assert got[1]["content_class"] == "other"
    # schema.org label beats the og fallback
    assert got[2]["content_class"] == "commerce"


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, html string")
    plan = textops.schema_types(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
