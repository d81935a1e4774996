"""Unit tests for dedup.drop_common_lines — the edges the contract
query's planted corpus doesn't isolate: an all-boilerplate document
(n_kept=0, kept_text=''), order preservation on reassembly, and the
trim-normalized match ('  footer ' drops together with 'footer').
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup  # noqa: E402


def _run(spark, rows, min_docs):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.drop_common_lines(df, "doc_id", min_docs=min_docs)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_drop_common_lines_semantics(spark):
    got = _run(
        spark,
        [
            (1, "unique alpha\nfooter\nunique beta"),
            (2, "footer\nsolo two"),
            (3, "  footer \nsolo three"),  # trim-normalized: same boilerplate
            (4, "footer"),  # all-boilerplate doc
        ],
        min_docs=3,
    )
    assert got[1]["n_lines"] == 3 and got[1]["n_kept"] == 2
    # reassembly keeps original order, not sorted-by-content order
    assert got[1]["kept_text"] == "unique alpha\nunique beta"
    assert got[2]["kept_text"] == "solo two"
    # the raw (untrimmed) line is removed when its trimmed form matches
    assert got[3]["kept_text"] == "solo three"
    # all-boilerplate doc survives as a row with empty text
    assert got[4]["n_lines"] == 1 and got[4]["n_kept"] == 0
    assert got[4]["kept_text"] == ""


def test_drop_common_lines_threshold(spark):
    # the same corpus with min_docs above the footer's reach drops nothing
    got = _run(
        spark,
        [(1, "a\nfooter"), (2, "footer\nb"), (3, "c")],
        min_docs=3,
    )
    assert all(g["n_kept"] == g["n_lines"] for g in got.values())


def test_drop_repeated_lines_semantics(spark):
    df = spark.createDataFrame(
        [
            # nav menu repeated top and bottom; ' home ' trims to 'home'
            (1, "home\nunique alpha\nhome\nunique beta\n home "),
            (2, "solo"),
            (3, "same\nsame\nsame"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r.asDict()
           for r in dedup.drop_repeated_lines(df, "doc_id").collect()}
    assert got[1]["n_lines"] == 5 and got[1]["n_kept"] == 3
    # first occurrence kept, original order preserved on reassembly
    assert got[1]["kept_text"] == "home\nunique alpha\nunique beta"
    assert got[2]["kept_text"] == "solo" and got[2]["n_kept"] == 1
    assert got[3]["n_lines"] == 3 and got[3]["n_kept"] == 1
    assert got[3]["kept_text"] == "same"


def test_drop_repeated_lines_composes_with_cross_doc(spark):
    # intra-doc cut first, then the cross-doc boilerplate stage: the
    # footer every doc repeats internally still counts each doc ONCE
    # toward min_docs after the intra cut.
    df = spark.createDataFrame(
        [
            (1, "footer\nbody one\nfooter"),
            (2, "footer\nbody two\nfooter"),
            (3, "footer\nbody three"),
        ],
        ["doc_id", "text"],
    )
    intra = dedup.drop_repeated_lines(df, "doc_id")
    out = dedup.drop_common_lines(
        intra.select("doc_id", intra.kept_text.alias("text")),
        "doc_id", min_docs=3,
    )
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[1]["kept_text"] == "body one"
    assert got[3]["kept_text"] == "body three"


def test_drop_repeated_lines_one_shuffle(spark):
    # the __doc-alone window partitioning exists so reassembly reuses
    # it: the whole kernel must cost exactly ONE Exchange.
    df = spark.createDataFrame([(1, "a\nb\na")], ["doc_id", "text"])
    plan = dedup.drop_repeated_lines(df, "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
