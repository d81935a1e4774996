"""Unit tests for snapshots.cache_policy — directive extraction,
s-maxage precedence, clamping, validator detection, and the
zero-shuffle plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import snapshots  # noqa: E402

CRLF = "\r\n"


def _policy(spark, headers):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(headers)],
        "doc_id long, headers string",
    )
    return {r["doc_id"]: r.asDict()
            for r in snapshots.cache_policy(df).collect()}


def test_directives_and_precedence(spark):
    got = _policy(
        spark,
        [
            "HTTP/1.1 200 OK" + CRLF + "Cache-Control: max-age=3600",
            "Cache-Control: s-maxage=7200, max-age=600",
            "Cache-Control: NO-STORE",
            "Cache-Control: no-cache" + CRLF + 'ETag: "x"',
            "Content-Type: text/html",
        ],
    )
    assert got[0]["max_age_s"] == 3600 and got[0]["refetch_after_s"] == 3600
    assert got[1]["max_age_s"] == 7200  # s-maxage wins (RFC 9111)
    assert got[2]["no_store"] and got[2]["refetch_after_s"] == 60
    assert got[3]["no_cache"] and got[3]["refetch_after_s"] == 60
    assert got[3]["has_etag"] and got[3]["has_validator"]
    assert got[4]["max_age_s"] is None
    assert got[4]["refetch_after_s"] == 86_400  # server silent -> default


def test_clamps(spark):
    got = _policy(
        spark,
        [
            "Cache-Control: max-age=0",           # lies low -> min 60
            "Cache-Control: max-age=999999999",   # lies high -> 30 d
        ],
    )
    assert got[0]["refetch_after_s"] == 60
    assert got[1]["refetch_after_s"] == 30 * 86_400


def test_validators_without_cache_control(spark):
    got = _policy(
        spark,
        [
            "Last-Modified: Wed, 21 Oct 2015 07:28:00 GMT",
            'etag: W/"weak"',
        ],
    )
    assert got[0]["has_validator"] and not got[0]["has_etag"]
    assert got[1]["has_etag"]
    # header names must anchor at line starts: an ETag mention in some
    # other header's VALUE must not count.
    got2 = _policy(spark, ["X-Debug: send etag: no" ])
    assert not got2[0]["has_etag"]


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "h")], "doc_id long, headers string")
    plan = snapshots.cache_policy(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_refetch_schedule_policy(spark):
    rows = [
        # (id, prev, changed, max_age, no_store)
        (0, 3600, True, None, False),    # halve -> 1800
        (1, 3600, False, None, False),   # double -> 7200
        (2, 100, True, None, False),     # halve floors at min 60
        (3, 20 * 86400, False, None, False),  # double clamps at 30 d
        (4, 3600, True, 86400, False),   # declared 1 d beats 1800
        (5, 3600, False, 600, False),    # adaptive 7200 beats declared
        (6, 3600, True, 86400, True),    # no_store voids the floor
    ]
    from crawler_spark.functions import snapshots as snaps
    df = spark.createDataFrame(
        rows,
        "doc_id long, prev_interval_s long, changed boolean, "
        "max_age_s long, no_store boolean",
    )
    got = {r["doc_id"]: (r["next_interval_s"], r["source"])
           for r in snaps.refetch_schedule(df).collect()}
    assert got[0] == (1800, "adaptive")
    assert got[1] == (7200, "adaptive")
    assert got[2] == (60, "adaptive")
    assert got[3] == (30 * 86400, "adaptive")
    assert got[4] == (86400, "declared")
    assert got[5] == (7200, "adaptive")
    assert got[6] == (1800, "adaptive")


def test_smaxage_does_not_leak_into_max_age(spark):
    # ADVICE r4: the max-age literal must not substring-match inside
    # s-maxage=.  A header carrying ONLY s-maxage sets max_age_s from
    # s-maxage and the mage extract stays empty.
    from crawler_spark.functions import snapshots

    df = spark.createDataFrame(
        [(0, "HTTP/1.1 200 OK\r\nCache-Control: s-maxage=7200\r\n"),
         (1, "HTTP/1.1 200 OK\r\nCache-Control:max-age=300\r\n"),
         (2, "HTTP/1.1 200 OK\r\nCache-Control: public,max-age=600\r\n")],
        "doc_id long, headers string",
    )
    got = {r["doc_id"]: r["max_age_s"]
           for r in snapshots.cache_policy(df).collect()}
    assert got[0] == 7200   # s-maxage only; not doubled into mage
    assert got[1] == 300    # colon boundary (no space)
    assert got[2] == 600    # comma boundary
