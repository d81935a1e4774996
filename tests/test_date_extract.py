"""Unit tests for dates.date_extract — source priority, calendar
plausibility, timestamp truncation, URL permalinks, null path, and
the zero-shuffle plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dates  # noqa: E402


def _extract(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, html string, url string")
    return {r["doc_id"]: (r["pub_date"], r["date_src"])
            for r in dates.date_extract(df).collect()}


def test_priority_order(spark):
    # every source present at once -> meta wins; drop meta -> time
    # wins; and so on down to bare text.
    full = (
        '<meta property="article:published_time" content="2021-01-01T05:00:00Z">'
        '<time datetime="2022-02-02">x</time>'
        '{"datePublished": "2023-03-03"}'
        'body says 2025-05-05'
    )
    got = _extract(
        spark,
        [
            (0, full, "https://e.com/2024/04/04/p/"),
            (1, full.replace("article:published_time", "og:title"),
             "https://e.com/2024/04/04/p/"),
            (2, '{"datePublished": "2023-03-03"} and 2025-05-05',
             "https://e.com/2024/04/04/p/"),
            (3, "no structured dates 2025-05-05",
             "https://e.com/2024/04/04/p/"),
            (4, "nothing here", "https://e.com/2024/04/04/p/"),
            (5, "prose only: 2025-05-05", "https://e.com/plain"),
            (6, "no date anywhere", "https://e.com/plain"),
        ],
    )
    assert got[0] == ("2021-01-01", "meta")  # truncated timestamp
    assert got[1] == ("2022-02-02", "time")
    assert got[2] == ("2023-03-03", "jsonld")
    assert got[3] == ("2024-04-04", "url")  # url outranks bare text
    assert got[4] == ("2024-04-04", "url")
    assert got[5] == ("2025-05-05", "text")
    assert got[6] == (None, None)


def test_url_beats_text(spark):
    got = _extract(
        spark,
        [(0, "prose date 2025-05-05", "https://e.com/2024/04/04/post/")],
    )
    assert got[0] == ("2024-04-04", "url")


def test_implausible_dates_rejected(spark):
    got = _extract(
        spark,
        [
            (0, "bad month 2021-13-01", "u"),
            (1, "bad day 2021-12-32", "u"),
            (2, "bad year 1889-05-05", "u"),
            (3, '<time datetime="2021-13-01">x</time> but 2021-12-31 ok', "u"),
        ],
    )
    assert got[0] == (None, None)
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    # invalid time tag falls through to the valid bare date
    assert got[3] == ("2021-12-31", "text")


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x", "u")],
                               "doc_id long, html string, url string")
    plan = dates.date_extract(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_us_prose_dates(spark):
    got = _extract(
        spark,
        [
            (0, "Published May 5, 2019 by staff", "u"),
            (1, "published JANUARY 31, 1999.", "u"),      # case-free
            (2, "Deced 45, 2019 nothing", "u"),           # no month
            (3, "Published May 32, 2019", "u"),           # day 32 invalid
            (4, "ISO wins 2020-01-01 over May 5, 2019", "u"),
            (5, "September 7, 2021 essay", "u"),
        ],
    )
    assert got[0] == ("2019-05-05", "text_us")
    assert got[1] == ("1999-01-31", "text_us")
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    assert got[4] == ("2020-01-01", "text")  # bare ISO outranks prose
    assert got[5] == ("2021-09-07", "text_us")


def test_bare_date_boundaries(spark):
    # ADVICE r4: ISO-shaped substrings inside longer tokens must not
    # read as publication dates — the bare-text pattern is anchored
    # with non-digit/non-hyphen boundary groups.
    got = _extract(
        spark,
        [
            # digit-glued prefix/suffix: no match
            (0, "order 12020-01-01 ref", "https://e.com/p"),
            (1, "span 2020-01-0123 end", "https://e.com/p"),
            # hyphen-glued: no match (range fragment / version chain)
            (2, "rev-2020-01-01-5 tag", "https://e.com/p"),
            # clean delimiters still match: space, punctuation, BOL/EOL
            (3, "posted 2020-01-01.", "https://e.com/p"),
            (4, "2020-01-01", "https://e.com/p"),
            # a letter prefix is a legal boundary (v2020-01-01 matches,
            # same as the RE2 (?<![\d-]) equivalent would)
            (5, "v2020-01-01", "https://e.com/p"),
        ],
    )
    assert got[0] == (None, None)
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[3] == ("2020-01-01", "text")
    assert got[4] == ("2020-01-01", "text")
    assert got[5] == ("2020-01-01", "text")
