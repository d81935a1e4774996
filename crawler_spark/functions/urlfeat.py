"""URL-feature quality scoring: the pre-fetch admission gate.

Production webtext pipelines filter by URL shape before spending a
fetch (RefinedWeb-style URL filtering; C4/FineWeb blocklists by URL
pattern): tracking-id paths, parameter farms, and calendar-depth paths
predict low-value pages.  Scoring the URL costs a few string kernels
per row; fetching it costs a network round trip plus parse — at a
10^10-URL frontier the gate pays for itself immediately.

Everything here is a narrow projection over built-in string functions
(whole-stage codegen, zero shuffle, zero Python), and every ratio is
integer ppm so the DuckDB oracle hash-matches bit-for-bit.

Reference parity: the reference crawls human-curated seed templates
(rule.go group URL lists) and gates admission only on the fetched body
(F9 short-body filter, task.go); this module extends that admission
gate to the pre-fetch side per SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# thresholds: RefinedWeb-shaped defaults, overridable per call
MAX_URL_LEN = 120
MAX_DIGIT_PPM = 300_000
MAX_QUERY_PARAMS = 3
MAX_PATH_DEPTH = 8

_HOST_RE = "^[a-z]+://([^/?#]+)"
_PATH_RE = "^[a-z]+://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _n_occurrences(col: Column, ch: str) -> Column:
    """Count of a literal character — length-difference trick, codegen."""
    return F.length(col) - F.length(F.replace(col, F.lit(ch), F.lit("")))


def url_features(
    df: DataFrame,
    url_col: str = "url",
    max_url_len: int = MAX_URL_LEN,
    max_digit_ppm: int = MAX_DIGIT_PPM,
    max_query_params: int = MAX_QUERY_PARAMS,
    max_path_depth: int = MAX_PATH_DEPTH,
) -> DataFrame:
    """Append integer URL-shape features + a spam flag.

    Output columns (appended to ``df``'s own): ``url_len``,
    ``path_depth`` ('/' count in the path), ``n_query_params``,
    ``digit_ppm`` (digit chars per million URL chars), ``pct_encoded``
    ('%' count), ``n_subdomains`` (host dots minus one, floored at 0),
    ``url_spam`` (any threshold exceeded).

    Scale shape: a ``select`` of string built-ins — no shuffle, no UDF;
    filters on ``url_spam`` push down to the frontier scan.
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, _HOST_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)

    url_len = F.length(url)
    path_depth = _n_occurrences(path, "/")
    n_params = F.when(query == "", F.lit(0)).otherwise(
        _n_occurrences(query, "&") + 1
    )
    n_digits = url_len - F.length(F.regexp_replace(url, "[0-9]", ""))
    digit_ppm = F.floor(n_digits * 1_000_000 / url_len)
    pct_encoded = _n_occurrences(url, "%")
    n_subdomains = F.greatest(_n_occurrences(host, ".") - 1, F.lit(0))

    out = df.select(
        "*",
        url_len.cast("long").alias("url_len"),
        path_depth.cast("long").alias("path_depth"),
        n_params.cast("long").alias("n_query_params"),
        digit_ppm.cast("long").alias("digit_ppm"),
        pct_encoded.cast("long").alias("pct_encoded"),
        n_subdomains.cast("long").alias("n_subdomains"),
    )
    spam = (
        (F.col("url_len") > max_url_len)
        | (F.col("digit_ppm") > max_digit_ppm)
        | (F.col("n_query_params") > max_query_params)
        | (F.col("path_depth") > max_path_depth)
    )
    return out.withColumn("url_spam", spam)


# query parameters that identify the click, not the content
TRACKING_PARAM_PREFIXES = ("utm_", "gclid=", "fbclid=", "msclkid=")


def canonical_url(url: Column) -> Column:
    """Tracking-param-free canonical form: strip ``utm_*``/click-id
    params, sort the survivors, rebuild.  Two URLs that differ only in
    tracking params or param ORDER map to one canonical string — the
    collapse step in front of the exact URL-seen set (urlnorm.canon_col
    normalizes scheme/port; this normalizes the query).  Pure
    split/filter/sort/join built-ins, scan-local."""
    base = F.regexp_replace(url, r"\?.*$", "")
    query = F.regexp_extract(url, r"\?(.*)", 1)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("gclid=")
        & ~p.startswith("fbclid=")
        & ~p.startswith("msclkid="),
    )
    rebuilt = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        base,
        F.when(rebuilt == "", F.lit("")).otherwise(F.concat(F.lit("?"), rebuilt)),
    )


def url_param_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse URLs by canonical (tracking-stripped, param-sorted)
    form: ``(url_canon, n_urls, n_distinct_raw, keep_id)`` — keep_id is
    the lowest id per group (deterministic canonical pick, same rule as
    cluster_keep_best).

    Scale shape: one groupBy on the canonical string with map-side
    partial aggregates; the countDistinct is the exact two-phase
    partial (swap approx_count_distinct at 10^10 URLs, same call
    site).
    """
    c = df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("raw"),
        canonical_url(F.col(url_col)).alias("url_canon"),
    )
    return c.groupBy("url_canon").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("raw").cast("long").alias("n_distinct_raw"),
        F.min("id").cast("long").alias("keep_id"),
    )
