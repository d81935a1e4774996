"""Anchor extraction/rollup edge cases (beyond the closed-form contract
query): attribute order, pages with no links, tie-breaking."""
from crawler_spark.functions import anchors


def test_anchor_pairs_edges(spark):
    pages = spark.createDataFrame(
        [
            ('<a class="q" href="/x" rel="nofollow">Home</a>'
             '<p>noise</p><a href="/y">Y page</a>',),
            ("<html>no links at all</html>",),
            ('<a href="/x">Home</a><a href="/x">Start</a>',),
        ],
        "html string",
    )
    pairs = anchors.anchor_pairs(pages).collect()
    assert sorted((r.target, r.anchor) for r in pairs) == [
        ("/x", "Home"), ("/x", "Home"), ("/x", "Start"), ("/y", "Y page"),
    ]
    out = {r.target: r for r in anchors.anchor_summary(
        anchors.anchor_pairs(pages)).collect()}
    assert out["/x"].n_refs == 3 and out["/x"].top_anchor == "Home"
    assert out["/y"].n_refs == 1


def test_anchor_summary_tie_breaks_lexicographic(spark):
    pairs = spark.createDataFrame(
        [("/t", "beta"), ("/t", "alpha")], "target string, anchor string"
    )
    row = anchors.anchor_summary(pairs).collect()[0]
    assert row.n_refs == 2 and row.top_anchor == "alpha"


def test_trap_scores_flags_template_explosion(spark):
    from crawler_spark.functions import traps

    rows = (
        # trap host: 90 calendar urls, one template
        [("trap", f"/cal/2026/{m}/{d}") for m in range(1, 10) for d in range(1, 11)]
        # healthy host: 10 distinct letter paths
        + [("ok", f"/about/{c}" ) for c in "abcdefghij"]
    )
    out = {
        r.host: r
        for r in traps.trap_scores(
            spark.createDataFrame(rows, "host string, url string")
        ).collect()
    }
    t = out["trap"]
    assert t.n_urls == 90 and t.n_templates == 1
    assert t.top_template == "/cal/#/#/#" and t.top_share_micro == 1_000_000
    ok = out["ok"]
    assert ok.n_templates == 10 and ok.urls_per_template_micro == 1_000_000
