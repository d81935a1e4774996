"""hreflang alternate-cluster resolution: group the language variants
of one logical page and elect a single keeper per cluster.

Multilingual sites publish every page in N languages and declare the
full variant set on each copy via ``<link rel="alternate"
hreflang="xx" href="...">`` (plus an ``x-default``).  A webtext corpus
that ignores this ships N near-translations of every page — which
monolingual dedup CANNOT catch (different languages share no shingles)
— and simultaneously throws away free page-aligned bitext.  This stage
resolves each page's declared variant set to a cluster id and elects
one keeper per cluster (preferred language if the cluster has it, else
the lexicographically-first URL, so election is deterministic).  The
reference crawler has no multilingual awareness at all.

Because every member page carries the FULL alternate set, the cluster
id is computable scan-locally from a page's own markup (x-default href
when declared, else the min alternate href) — no graph algorithm, no
iteration; the only shuffle is the per-cluster keeper election.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TAG_RE = r'(?i)<link\b[^>]*rel="alternate"[^>]*>'
_LANG_RE = r'hreflang="([^"]*)"'
_HREF_RE = r'href="([^"]*)"'


def hreflang_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    keep_lang: str = "en",
) -> DataFrame:
    """``(id, cluster_id, page_lang, n_alts, is_keeper)``.

    cluster_id: the x-default href when the page declares one, else
    the min alternate href, else the page's own URL (page with no
    alternates = its own singleton cluster).  page_lang: the hreflang
    whose href is the page's own URL (self-reference, per the spec).
    is_keeper: elected once per cluster — the ``keep_lang`` member if
    the cluster has one, else the min-URL member.

    Scale shape: tag extraction and per-tag attribute regexes are
    scan-local codegen HOFs (transform over regexp_extract_all —
    attribute ORDER is free); the election is ONE groupBy(cluster_id)
    whose group size is bounded by languages-per-page (~dozens max),
    so no hot key is possible, and the keeper map joins back by
    cluster_id.
    """
    tags = F.regexp_extract_all(
        F.col(html_col), F.lit(_TAG_RE), F.lit(0)
    )
    langs = F.transform(tags, lambda t: F.regexp_extract(t, _LANG_RE, 1))
    hrefs = F.transform(tags, lambda t: F.regexp_extract(t, _HREF_RE, 1))
    xidx = F.array_position(langs, "x-default")
    selfidx = F.array_position(hrefs, F.col(url_col))
    pages = df.select(
        F.col(id_col),
        F.col(url_col).alias("__url"),
        F.coalesce(
            F.when(xidx > 0, F.element_at(hrefs, xidx.cast("int"))),
            F.array_min(hrefs),
            F.col(url_col),
        ).alias("cluster_id"),
        F.when(selfidx > 0, F.element_at(langs, selfidx.cast("int")))
        .alias("page_lang"),
        F.size(tags).cast("long").alias("n_alts"),
    )
    elected = pages.groupBy("cluster_id").agg(
        F.min(F.when(F.col("page_lang") == keep_lang, F.col("__url")))
        .alias("__keep_url"),
        F.min("__url").alias("__min_url"),
    )
    return (
        pages.join(elected, "cluster_id")
        .select(
            F.col(id_col),
            "cluster_id",
            "page_lang",
            "n_alts",
            (F.col("__url") == F.coalesce("__keep_url", "__min_url"))
            .alias("is_keeper"),
        )
    )


def bitext_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    pivot_lang: str = "en",
) -> DataFrame:
    """Page-aligned bitext mining: ``(id_pivot, id_other, cluster_id,
    lang_other)`` — one row per (pivot-language page, other-language
    page) pair inside an hreflang cluster.

    The flip side of :func:`hreflang_clusters`' dedup use: the same
    alternate sets that make multilingual variants a contamination
    risk are free PAGE-ALIGNED translation pairs — the standard seed
    for parallel-corpus mining (WikiMatrix/CCMatrix start from far
    weaker document alignment than a publisher's own declaration).

    Scale shape: cluster ids are scan-local (see hreflang_clusters);
    the pair join is a self-join keyed by cluster_id whose fan-out is
    (languages-per-page - 1) per pivot page — bounded by the markup,
    never quadratic in the corpus.  One shuffle per side, both keyed
    by cluster_id.
    """
    pages = hreflang_clusters(
        df, id_col=id_col, url_col=url_col, html_col=html_col,
        keep_lang=pivot_lang,
    ).select(id_col, "cluster_id", "page_lang")
    pivots = pages.where(F.col("page_lang") == pivot_lang).select(
        F.col(id_col).alias("id_pivot"), "cluster_id"
    )
    others = pages.where(
        F.col("page_lang").isNotNull()
        & (F.col("page_lang") != pivot_lang)
    ).select(
        F.col(id_col).alias("id_other"), "cluster_id",
        F.col("page_lang").alias("lang_other"),
    )
    return pivots.join(others, "cluster_id").select(
        "id_pivot", "id_other", "cluster_id", "lang_other"
    )
