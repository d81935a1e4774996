"""Sitemap ingestion: parse sitemap.xml bodies fetched by the crawl
loop into frontier seed rows (url, lastmod, priority).  Sitemaps are
the polite seed-discovery channel next to link extraction — combined
with snapshots.recrawl_priority, ``lastmod`` lets the scheduler skip
re-fetching pages the host declares unchanged.

Parsing is a two-level codegen chain, no Python: (1) one non-greedy
regex splits the document into ``<url>...</url>`` blocks
(regexp_extract_all), (2) ``F.transform`` maps a per-field
regexp_extract over each block ELEMENT — field pairing is by block, so
a missing optional field (lastmod, priority) in one entry cannot shift
another entry's values, unlike positional zipping of independent
field-level extracts.  Priority is parsed into integer micro-units
(0.8 -> 800000); absent fields surface as '' / the 500000 spec default.

Scale shape: fully scan-local (one pass over each sitemap body, rows
explode 1->N) — sitemap parsing shuffles nothing; whatever consumes
the seeds (dedup anti-join, frontier append) owns the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<\s][^<]*?)\s*</lastmod>"
_PRIORITY_RE = r"<priority>\s*([0-9.]+)\s*</priority>"

# sitemaps.org: "The default priority of a page is 0.5."
DEFAULT_PRIORITY_MICRO = 500_000


def _priority_micro(block: Column) -> Column:
    p = F.regexp_extract(block, _PRIORITY_RE, 1)
    return (
        F.when(p == "", F.lit(DEFAULT_PRIORITY_MICRO))
        .otherwise(F.floor(p.cast("double") * 1_000_000))
        .cast("long")
    )


def parse_sitemap(pages: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Explode sitemap documents into ``(url, lastmod, priority_micro)``
    seed rows.  Entries without a ``<loc>`` are dropped (spec requires
    it); ``lastmod`` is kept as the raw W3C datetime string — parsing
    it to a timestamp is the consumer's choice of precision."""
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_BLOCK_RE), F.lit(1))
    entry = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC_RE, 1).alias("url"),
            F.regexp_extract(b, _LASTMOD_RE, 1).alias("lastmod"),
            _priority_micro(b).alias("priority_micro"),
        ),
    )
    return (
        pages.select(F.explode(entry).alias("e"))
        .select("e.url", "e.lastmod", "e.priority_micro")
        .where(F.col("url") != "")
    )
