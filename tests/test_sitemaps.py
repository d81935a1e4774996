"""Sitemap parser edge cases beyond the closed-form contract row."""
from crawler_spark.functions import sitemaps


def test_parse_sitemap_blocks_and_defaults(spark):
    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><lastmod>2026-02-01</lastmod></url>"  # no loc -> dropped
        "<url><loc>\n  https://ex.com/a \n</loc>"
        "<priority>0.8</priority></url>"
        "<url><loc>https://ex.com/b</loc><lastmod> 2026-03-04 </lastmod></url>"
        "</urlset>"
    )
    pages = spark.createDataFrame([(xml,), ("<urlset></urlset>",)], "xml string")
    rows = {r.url: r for r in sitemaps.parse_sitemap(pages).collect()}
    assert set(rows) == {"https://ex.com/a", "https://ex.com/b"}
    a = rows["https://ex.com/a"]
    assert a.priority_micro == 800_000 and a.lastmod == ""
    b = rows["https://ex.com/b"]
    # missing priority -> the sitemaps.org default 0.5; lastmod trimmed
    assert b.priority_micro == 500_000 and b.lastmod == "2026-03-04"
