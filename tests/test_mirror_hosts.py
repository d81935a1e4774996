"""Unit tests for hoststats.mirror_hosts — mirror-pair detection,
min_shared noise suppression, the containment-on-smaller-host score,
and the max_hosts_per_fp stop-fingerprint cap.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import hoststats  # noqa: E402


def _df(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_mirror_pair_and_noise_suppression(spark):
    # h1/h2 share 3 of their 4 pages (mirror); h3 shares exactly ONE
    # page with h1 (noise -> min_shared kills it); h4 fully disjoint.
    rows = []
    for p in range(4):
        rows.append(("h1", f"page {p}"))
    for p in range(3):
        rows.append(("h2", f"page {p}"))
    rows.append(("h2", "h2 only page"))
    rows.append(("h3", "page 0"))
    rows.append(("h3", "h3 own a"))
    rows.append(("h3", "h3 own b"))
    for p in range(3):
        rows.append(("h4", f"elsewhere {p}"))
    out = {
        (r["host_lo"], r["host_hi"]): (r["shared"], r["overlap_micro"])
        for r in hoststats.mirror_hosts(_df(spark, rows)).collect()
    }
    assert set(out) == {("h1", "h2")}
    shared, overlap = out[("h1", "h2")]
    assert shared == 3
    assert overlap == 750_000  # 3 of min(4, 4)


def test_small_alias_contained_in_big_site(spark):
    # tiny alias host (2 pages) fully inside a 10-page site: overlap
    # is containment on the SMALLER side -> 1e6 despite size mismatch.
    rows = [("big", f"content {p}") for p in range(10)]
    rows += [("tiny", "content 0"), ("tiny", "content 1")]
    out = hoststats.mirror_hosts(_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["host_lo"] == "big" and out[0]["host_hi"] == "tiny"
    assert out[0]["shared"] == 2 and out[0]["overlap_micro"] == 1_000_000


def test_threshold_filters_partial_overlap(spark):
    # 2 shared of 8 pages each = 250k overlap -> below the 500k bar.
    rows = [("a", f"s {p}") for p in range(2)]
    rows += [("a", f"a {p}") for p in range(6)]
    rows += [("b", f"s {p}") for p in range(2)]
    rows += [("b", f"b {p}") for p in range(6)]
    assert hoststats.mirror_hosts(_df(spark, rows)).count() == 0
    kept = hoststats.mirror_hosts(_df(spark, rows), threshold_micro=200_000)
    assert kept.count() == 1


def test_stop_fp_cap_drops_web_wide_boilerplate(spark):
    # one parked-lander body on 6 hosts + a real 3-page mirror pair:
    # with the cap at 5 the lander fp is dropped from pair generation,
    # so only the true mirror pair survives — and its shared count
    # EXCLUDES the lander page while sizes still count it.
    rows = [(f"p{i}", "parked domain lander") for i in range(6)]
    rows += [("p0", f"real {p}") for p in range(3)]
    rows += [("p1", f"real {p}") for p in range(3)]
    out = hoststats.mirror_hosts(
        _df(spark, rows), max_hosts_per_fp=5, threshold_micro=500_000
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["host_lo"], r["host_hi"]) == ("p0", "p1")
    assert r["shared"] == 3  # lander excluded by the cap
    assert r["overlap_micro"] == 750_000  # 3 of min(4, 4)
    # cap off: lander joins every pair, all 15 pairs share >=1 but
    # only the mirror pair passes min_shared + threshold; its shared
    # count now INCLUDES the lander page.
    out2 = hoststats.mirror_hosts(_df(spark, rows), max_hosts_per_fp=None)
    rows2 = out2.collect()
    assert len(rows2) == 1 and rows2[0]["shared"] == 4


def test_fingerprint_normalization_collapses_whitespace_case(spark):
    rows = [
        ("x", "Hello   World"),
        ("x", "unique to x"),
        ("y", "hello world"),
        ("y", "unique to y"),
    ]
    out = hoststats.mirror_hosts(_df(spark, rows), min_shared=1).collect()
    assert len(out) == 1 and out[0]["shared"] == 1
