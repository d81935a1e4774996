"""RSS/Atom feed ingestion: parse feed bodies fetched by the crawl loop
into discovery rows (url, title, published) — the freshness-discovery
channel next to sitemaps (sitemaps.py) and link extraction.  News/blog
crawling at scale polls feeds far more often than it recrawls pages:
a feed is one small fetch that names every new URL on the host.

Same architecture as sitemap parsing: a two-level codegen chain, no
Python — (1) one non-greedy regex splits the document into item/entry
blocks (regexp_extract_all), (2) ``F.transform`` maps per-field
regexp_extracts over each block ELEMENT, so a missing optional field in
one entry can never shift another entry's values.  RSS 2.0 ``<item>``
(link as element text) and Atom ``<entry>`` (link as href attribute)
are both handled; ``kind`` tags which grammar matched.

Scale shape: fully scan-local (rows explode 1->N inside the scan
projection); whatever consumes the discovered URLs (dedup anti-join,
frontier append) owns the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RSS_ITEM_RE = r"(?s)<item>(.*?)</item>"
_ATOM_ENTRY_RE = r"(?s)<entry>(.*?)</entry>"
_RSS_LINK_RE = r"<link>\s*([^<\s][^<]*?)\s*</link>"
_ATOM_LINK_RE = r"<link[^>]*href=\"([^\"]+)\""
_TITLE_RE = r"(?s)<title>\s*(.*?)\s*</title>"
_RSS_DATE_RE = r"<pubDate>\s*([^<]+?)\s*</pubDate>"
_ATOM_DATE_RE = r"<updated>\s*([^<]+?)\s*</updated>"


def _entries(xml: Column, block_re: str, link_re: str, date_re: str, kind: str) -> Column:
    blocks = F.regexp_extract_all(xml, F.lit(block_re), F.lit(1))
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, link_re, 1).alias("url"),
            F.regexp_extract(b, _TITLE_RE, 1).alias("title"),
            F.regexp_extract(b, date_re, 1).alias("published"),
            F.lit(kind).alias("kind"),
        ),
    )


def parse_feeds(pages: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode RSS/Atom feed documents into
    ``(url, title, published, kind)`` discovery rows.  Entries without
    a link are dropped; ``published`` stays the raw RFC-822 / RFC-3339
    string (timestamp precision is the consumer's choice, same policy
    as sitemap ``lastmod``)."""
    xml = F.col(xml_col)
    both = F.concat(
        _entries(xml, _RSS_ITEM_RE, _RSS_LINK_RE, _RSS_DATE_RE, "rss"),
        _entries(xml, _ATOM_ENTRY_RE, _ATOM_LINK_RE, _ATOM_DATE_RE, "atom"),
    )
    return (
        pages.select(F.explode(both).alias("e"))
        .select("e.url", "e.title", "e.published", "e.kind")
        .where(F.col("url") != "")
    )
