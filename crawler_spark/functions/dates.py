"""Publication-date extraction: the temporal-metadata stage a webtext
corpus needs for recency filtering, dated eval splits ("train on
pre-2023 only"), and change-rate modeling (snapshots.recrawl_priority
consumes real dates in production).  The reference crawler stamps rows
with FETCH time only (rule.go time.Now format); the page's own
publication date lives in its markup and must be mined.

Sources, checked in strict priority order (structured beats prose):

1. ``<meta property="article:published_time" content="...">``  (Open
   Graph / article schema — the most reliable when present)
2. ``<time datetime="...">``                       (HTML5 semantic tag)
3. ``"datePublished": "..."``                        (JSON-LD blob)
4. ``/YYYY/MM/DD/`` in the URL path                (news/blog permalinks)
5. first bare ISO date in the body text            (last resort)

Only calendar-plausible ISO dates match ((19|20)YY, month 01-12, day
01-31), and timestamps are truncated to the date part.  Output is the
date STRING plus the winning source label, so downstream can weight
trust by provenance (URL/text dates are weaker evidence than OG tags).

Scale shape: ZERO shuffle — five regexp_extracts and a CASE coalesce,
all in one WholeStageCodegen scan projection; no UDF, no parsing
library.  Every pattern is shared verbatim with the DuckDB oracle
(RE2-safe: no lookaround, no backreferences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# calendar-plausible ISO date (shared with the oracle verbatim)
ISO = r"((?:19|20)\d{2}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]))"

DATE_PATTERNS = (
    # (source label, column the pattern reads, regex with ONE group)
    ("meta", "html",
     r'article:published_time[^>]*content="' + ISO),
    ("time", "html", r'<time[^>]*datetime="' + ISO),
    ("jsonld", "html", r'"datePublished"\s*:\s*"' + ISO),
    ("url", "url",
     r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])/(0[1-9]|[12]\d|3[01])/"),
    # bare body date: anchored with non-digit/non-hyphen boundaries so
    # ISO-shaped substrings inside longer tokens (cache-buster params,
    # '2020-01-0123', '12020-01-01') don't read as publication dates —
    # RE2-safe boundary groups, no lookaround (ADVICE r4)
    ("text", "html", r"(?:^|[^0-9-])" + ISO + r"(?:[^0-9-]|$)"),
    ("text_us", "html",
     r"(?i)(January|February|March|April|May|June|July|August"
     r"|September|October|November|December)\s+(\d{1,2}),\s+"
     r"((?:19|20)\d{2})"),
)

MONTHS = ("january", "february", "march", "april", "may", "june",
          "july", "august", "september", "october", "november",
          "december")


def date_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """``(id, pub_date, date_src)`` — first match in priority order,
    nulls when no source fires.  ``date_src`` in {meta, time, jsonld,
    url, text, text_us} — text_us is US-prose "May 5, 2019" (huge on
    US blogs/news), lowest priority and day-validated 1-31 via the
    month-name map + lpad normalization to ISO."""
    cols = {"html": F.col(html_col), "url": F.col(url_col)}
    expr_date, expr_src = None, None
    for label, col_key, pat in DATE_PATTERNS:
        src = cols[col_key]
        if label == "url":
            cand = F.concat_ws(
                "-",
                F.regexp_extract(src, pat, 1),
                F.regexp_extract(src, pat, 2),
                F.regexp_extract(src, pat, 3),
            )
            cand = F.when(F.regexp_extract(src, pat, 1) != "", cand
                          ).otherwise(F.lit(""))
        elif label == "text_us":
            mname = F.lower(F.regexp_extract(src, pat, 1))
            mnum = None
            for i, m in enumerate(MONTHS):
                c = F.when(mname == m, F.lit("%02d" % (i + 1)))
                mnum = c if mnum is None else mnum.when(
                    mname == m, F.lit("%02d" % (i + 1)))
            day = F.regexp_extract(src, pat, 2).cast("int")
            cand = F.when(
                (mname != "") & day.between(1, 31),
                F.concat_ws(
                    "-",
                    F.regexp_extract(src, pat, 3),
                    mnum,
                    F.lpad(day.cast("string"), 2, "0"),
                ),
            ).otherwise(F.lit(""))
        else:
            cand = F.regexp_extract(src, pat, 1)
        hit = cand != ""
        if expr_date is None:
            expr_date = F.when(hit, cand)
            expr_src = F.when(hit, F.lit(label))
        else:
            expr_date = expr_date.when(hit, cand)
            expr_src = expr_src.when(hit, F.lit(label))
    return df.select(
        F.col(id_col),
        expr_date.otherwise(F.lit(None).cast("string")).alias("pub_date"),
        expr_src.otherwise(F.lit(None).cast("string")).alias("date_src"),
    )
