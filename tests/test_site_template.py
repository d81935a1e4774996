"""Unit tests for dedup.drop_site_template_lines — per-host threshold
scoping (a line common ACROSS hosts but rare within each survives),
ordered reassembly, and composition with the intra-doc stage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup  # noqa: E402


def _run(spark, rows, min_docs=2):
    df = spark.createDataFrame(
        rows, "doc_id long, host string, text string"
    )
    out = dedup.drop_site_template_lines(df, "doc_id", min_docs=min_docs)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_per_host_scoping(spark):
    # "footer A" repeats on host A (dropped there) and appears ONCE on
    # host B (kept there) — the global stage cannot express this.
    rows = [
        (1, "a", "footer A\ncontent one"),
        (2, "a", "footer A\ncontent two"),
        (3, "b", "footer A\ncontent three"),
        (4, "b", "own line\ncontent four"),
    ]
    got = _run(spark, rows)
    assert got[1]["n_kept"] == 1 and got[1]["kept_text"] == "content one"
    assert got[2]["kept_text"] == "content two"
    assert got[3]["n_kept"] == 2  # footer A kept on host b
    assert got[3]["kept_text"] == "footer A\ncontent three"
    assert got[4]["kept_text"] == "own line\ncontent four"


def test_reassembly_order_and_trim_matching(spark):
    rows = [
        (1, "a", "z last\n  nav  \nfirst part"),
        (2, "a", "nav\nmiddle"),
        (3, "a", "other\n nav "),
    ]
    got = _run(spark, rows, min_docs=3)
    # trimmed "nav" matches across whitespace variants -> dropped in all
    assert got[1]["kept_text"] == "z last\nfirst part"
    assert got[2]["kept_text"] == "middle"
    assert got[3]["kept_text"] == "other"


def test_all_template_doc_empty(spark):
    rows = [
        (1, "a", "nav"),
        (2, "a", "nav"),
        (3, "a", "nav\nreal"),
    ]
    got = _run(spark, rows, min_docs=3)
    assert got[1]["n_kept"] == 0 and got[1]["kept_text"] == ""
    assert got[3]["kept_text"] == "real"


def test_composes_with_intradoc_stage(spark):
    # intra-doc pass first (dedupe repeats inside a page), then the
    # site pass — same output contract keys chained on kept_text.
    rows = [
        (1, "a", "nav\nnav\nbody one"),
        (2, "a", "nav\nbody two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    intra = dedup.drop_repeated_lines(df, "doc_id")
    rejoined = intra.select("doc_id", "kept_text").join(
        df.select("doc_id", "host"), "doc_id"
    ).withColumnRenamed("kept_text", "text")
    out = dedup.drop_site_template_lines(rejoined, "doc_id", min_docs=2)
    got = {r["doc_id"]: r["kept_text"] for r in out.collect()}
    assert got == {1: "body one", 2: "body two"}
