"""C4 badwords gate + density-based main-content extraction.

Hand-computed expectations; corpus-scale hash gates are the
badwords_filter / main_content contract rows.
"""
from __future__ import annotations

from crawler_spark.functions.textops import badwords_stats, main_content


def test_badwords_counts_and_flag(spark):
    df = spark.createDataFrame(
        [
            (1, "Buy viagra now! casino casino"),  # 5 toks, 3 bad
            (2, "clean text here"),
            (3, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in badwords_stats(df).collect()}
    assert (rows[1].n_tokens, rows[1].n_bad, rows[1].is_flagged) == (5, 3, True)
    assert rows[1].bad_ppm == 3 * 1_000_000 // 5
    assert (rows[2].n_bad, rows[2].is_flagged) == (0, False)
    assert (rows[3].n_tokens, rows[3].bad_ppm) == (0, 0)


def test_badwords_whole_token_only(spark):
    # substring hits must NOT count: classic Scunthorpe non-problem
    df = spark.createDataFrame(
        [(1, "scunthorpe casinos viagrafalls")], ["doc_id", "text"]
    )
    r = badwords_stats(df).collect()[0]
    assert r.n_bad == 0 and not r.is_flagged


def test_badwords_case_and_punct(spark):
    df = spark.createDataFrame([(1, "VIAGRA,xxx;PORN!")], ["doc_id", "text"])
    r = badwords_stats(df).collect()[0]
    assert r.n_bad == 3 and r.n_tokens == 3 and r.is_flagged


def test_main_content_keeps_prose_drops_chrome(spark):
    html = (
        '<div><ul><li><a href="/">Home</a></li>'
        '<li><a href="/x">About</a></li></ul></div>'
        "<div>This is the real article content, long and link free.</div>"
        "<p>Second paragraph of genuine prose with plenty of characters.</p>"
        '<div><a href="/n">next</a> | <a href="/p">prev</a></div>'
        "<footer>short</footer>"
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    r = main_content(df).collect()[0]
    assert r.n_kept == 2
    assert r.content == (
        "This is the real article content, long and link free.\n"
        "Second paragraph of genuine prose with plenty of characters."
    )


def test_main_content_link_density_rule(spark):
    # long block whose text is mostly anchor text must drop:
    # visible = 45 chars, anchor = 36 chars -> 3*36 >= 45
    linky = (
        '<div><a href="/a">all of this block text is</a> inside '
        '<a href="/b">anchors mostly</a></div>'
    )
    prose = "<p>" + "word " * 10 + "tail</p>"  # 54 visible chars, 0 anchor
    df = spark.createDataFrame(
        [(1, linky), (2, prose)], ["doc_id", "html"]
    )
    rows = {r.doc_id: r for r in main_content(df).collect()}
    assert rows[1].n_kept == 0 and rows[1].content == ""
    assert rows[2].n_kept == 1


def test_main_content_min_chars_gate(spark):
    df = spark.createDataFrame(
        [(1, "<p>too short</p><p>this block easily clears the floor</p>")],
        ["doc_id", "html"],
    )
    r = main_content(df, min_chars=25).collect()[0]
    assert r.n_kept == 1
    assert r.content == "this block easily clears the floor"


def test_gates_zero_shuffle_plans(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    h = spark.createDataFrame([(1, "<p>x</p>")], ["doc_id", "html"])
    p1 = badwords_stats(df)._jdf.queryExecution().executedPlan().toString()
    p2 = main_content(h)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p1 and "Exchange" not in p2
