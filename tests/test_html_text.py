"""html_to_text (SQL regex pipeline) vs its Python twin — including on
the reference's real fixture pages — and the zlib compressibility
signal."""

from __future__ import annotations

import os
import zlib

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import textops

REF = "/root/reference/testhtml"

SNIPPETS = [
    "<html><body><p>Hello &amp; welcome</p><script>var x = '<p>';</script>"
    "<style>p { color: red }</style><div>line two</div></body></html>",
    "<ul><li>one</li><li>two</li></ul>",
    "plain text, no markup",
    "",
    "<p>&lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end</p>",
    "<!-- comment --><h1>Title</h1>after<br/>break",
]


def _sql_extract(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, h string")
    return {
        r.i: r.t
        for r in df.select("i", textops.html_to_text(F.col("h")).alias("t")).collect()
    }


def test_html_to_text_sql_matches_python(spark):
    got = _sql_extract(spark, SNIPPETS)
    for i, s in enumerate(SNIPPETS):
        assert got[i] == textops.html_to_text_py(s), s


def test_html_to_text_semantics():
    out = textops.html_to_text_py(SNIPPETS[0])
    assert "Hello & welcome" in out
    assert "var x" not in out and "color" not in out  # script/style gone
    assert "<" not in out
    assert "line two" in out
    out2 = textops.html_to_text_py(SNIPPETS[4])
    assert out2 == "<tag> \"q\" 's' end"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference fixtures unavailable")
def test_html_to_text_on_reference_pages(spark):
    pages = []
    for name in ("index.html", "fiction_tag.html", "book_detail.html"):
        with open(os.path.join(REF, name), "rb") as f:
            pages.append(f.read().decode("utf-8"))
    got = _sql_extract(spark, pages)
    for i, page in enumerate(pages):
        want = textops.html_to_text_py(page)
        assert got[i] == want
        assert "<script" not in got[i].lower()
        assert "<div" not in got[i].lower()
    # the real book page's visible fields survive extraction
    assert "出版社" in got[2]


def test_compression_ratio(spark):
    rows = [
        (0, "abab" * 500),          # repetitive -> low ratio
        (1, os.urandom(1000).hex()),  # high-entropy-ish hex
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.zratio_micro for r in textops.compression_ratio_micro(df).collect()}
    assert got[0] < got[1]
    assert got[2] == 0 and got[3] == 0
    raw = rows[0][1].encode()
    assert got[0] == len(zlib.compress(raw, 6)) * 1_000_000 // len(raw)
