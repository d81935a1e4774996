"""Anchor-text aggregation: collect, per TARGET url, the text of the
links pointing at it across the whole corpus.  Aggregated anchor text
is the classic off-page relevance/description signal (it is how search
engines and LLM-pretraining pipelines describe pages they never parsed,
and a quality input for crawl prioritization alongside
graph.pagerank_micro).  The reference crawler extracts hrefs only
(ParseGroupUrl, rule.go); this keeps the paired visible text too.

Scale shape: extraction is a scan-local codegen regex pair over the
page html (one pass, two capture groups, zipped — no Python); the
rollup is one shuffle on (target, anchor) with map-side combine, then
one on target.  The per-target winner is a min(struct(-count, anchor))
aggregation — deterministic (max count, ties to the lexicographically
smallest anchor) and partial-aggregatable, so hub pages with 10^8
in-links cost a combine tree, not a sorted window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# href first, then the visible anchor text up to the closing tag.
# Matches the reference extraction scope: double-quoted hrefs, plain
# text anchors (nested markup is out of contract, as in parsers.py).
ANCHOR_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def anchor_pairs(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Explode every page into ``(target, anchor)`` link rows.
    Both capture groups are extracted in one codegen pass each and
    zipped positionally — the arrays come from the same regex over the
    same input so they are always aligned."""
    h = F.col(html_col)
    hrefs = F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(1))
    texts = F.regexp_extract_all(h, F.lit(ANCHOR_RE), F.lit(2))
    pair = F.explode(
        F.zip_with(
            hrefs,
            texts,
            lambda a, b: F.struct(a.alias("target"), b.alias("anchor")),
        )
    )
    return pages.select(pair.alias("p")).select("p.target", "p.anchor")


def anchor_summary(pairs: DataFrame) -> DataFrame:
    """Per-target rollup: total in-link count and the most frequent
    anchor text (ties to the smallest string).  Two map-side-combined
    aggregations; no windows."""
    g = pairs.groupBy("target", "anchor").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        g.groupBy("target")
        .agg(
            F.sum("cnt").cast("long").alias("n_refs"),
            F.min(
                F.struct((-F.col("cnt")).alias("negcnt"), F.col("anchor"))
            ).alias("w"),
        )
        .select("target", "n_refs", F.col("w.anchor").alias("top_anchor"))
    )


def focused_priority(
    pairs: DataFrame,
    keywords: tuple[str, ...],
    url_boost_micro: int = 250_000,
    max_url_hits: int = 4,
) -> DataFrame:
    """Focused-crawl frontier scoring (Chakrabarti-style topical
    crawling): ``(target, n_refs, n_hit_refs, url_hits, focus_micro)``
    — how topically relevant each frontier URL looks BEFORE fetching
    it, from the two signals available pre-fetch: the anchor text of
    the links pointing at it, and the URL string itself.

    A focused crawl spends its politeness budget on the topic: the
    frontier ranks by ``focus_micro`` = floor(1e6 * hit-inlinks /
    inlinks) + url_boost * min(url keyword hits, cap), composing with
    the engine's two-level priority queue exactly like
    graph.pagerank_micro and hoststats.host_reputation do.  The
    reference's priority is a static per-RULE constant (schedule.go);
    it cannot prefer on-topic pages within a rule.

    ``keywords`` are compile-time literals: each expands to a codegen
    ``contains`` on the lowercased anchor (substring semantics —
    lexicon entries are chosen to be unambiguous, the standard
    focused-crawl trade).  Scale shape: pair scoring is scan-local;
    the rollup is ONE map-side-combined groupBy(target); the URL-hit
    term is computed on the aggregated row (one row per target, not
    per link).
    """
    if not keywords:
        raise ValueError("focused_priority needs a non-empty lexicon")

    def hits(col):
        lowered = F.lower(col)
        return sum(
            lowered.contains(k.lower()).cast("long") for k in keywords
        )

    per_pair = pairs.select(
        "target", (hits(F.col("anchor")) > 0).cast("long").alias("__hit")
    )
    agg = per_pair.groupBy("target").agg(
        F.count(F.lit(1)).cast("long").alias("n_refs"),
        F.sum("__hit").cast("long").alias("n_hit_refs"),
    )
    url_hits = hits(F.col("target"))
    return agg.select(
        "target", "n_refs", "n_hit_refs",
        url_hits.cast("long").alias("url_hits"),
        (
            F.floor(F.col("n_hit_refs") * 1_000_000 / F.col("n_refs"))
            + url_boost_micro * F.least(url_hits, F.lit(max_url_hits))
        ).cast("long").alias("focus_micro"),
    )
