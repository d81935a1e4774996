"""Unit tests for textops.table_extract — nested-tag stripping,
header detection, multiple tables, rowless/tableless docs, dotall
matching across newlines, and the zero-shuffle plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


def _rows(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return [r.asDict() for r in textops.table_extract(df)
            .orderBy("table_idx", "row_idx").collect()]


def test_basic_table_with_nested_tags(spark):
    got = _rows(
        spark,
        "<table>\n<tr><th>H1</th><th>H2</th></tr>\n"
        '<tr><td><a href="x">link</a> cell</td><td><b>bold</b></td></tr>\n'
        "</table>",
    )
    assert len(got) == 2
    assert got[0]["is_header"] and got[0]["row_text"] == "H1 | H2"
    assert not got[1]["is_header"]
    assert got[1]["row_text"] == "link cell | bold"
    assert got[1]["n_cells"] == 2


def test_multiple_tables_and_indices(spark):
    got = _rows(
        spark,
        "<TABLE><TR><TD>a</TD></TR></TABLE>text"
        "<table><tr><td>b</td></tr><tr><td>c</td></tr></table>",
    )
    assert [(r["table_idx"], r["row_idx"], r["row_text"]) for r in got] == [
        (0, 0, "a"), (1, 0, "b"), (1, 1, "c")
    ]


def test_tableless_doc_emits_nothing(spark):
    assert _rows(spark, "<p>no tables at all</p>") == []


def test_mixed_th_td_row_is_header(spark):
    got = _rows(spark, "<table><tr><th>k</th><td>v</td></tr></table>")
    assert got[0]["is_header"] and got[0]["row_text"] == "k | v"


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, html string")
    plan = textops.table_extract(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
