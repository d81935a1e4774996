"""Unit tests for hreflang.hreflang_clusters — attribute-order
freedom, x-default vs min-href cluster ids, keeper election with and
without the preferred language, singleton pages, and the single
cluster-keyed shuffle.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import hreflang  # noqa: E402


def _tag(lang, href, reorder=False):
    if reorder:
        return f'<link href="{href}" hreflang="{lang}" rel="alternate">'
    return f'<link rel="alternate" hreflang="{lang}" href="{href}">'


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = hreflang.hreflang_clusters(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_cluster_and_election(spark):
    en, de = "https://s.io/p/en", "https://s.io/p/de"
    html = _tag("en", en) + _tag("de", de, reorder=True)
    got = _run(spark, [(1, en, html), (2, de, html)])
    # no x-default -> min href = de url
    assert got[1]["cluster_id"] == de and got[2]["cluster_id"] == de
    assert got[1]["page_lang"] == "en" and got[2]["page_lang"] == "de"
    assert got[1]["is_keeper"] and not got[2]["is_keeper"]  # en preferred
    assert got[1]["n_alts"] == 2


def test_x_default_wins_cluster_id(spark):
    en, de = "https://s.io/q/en", "https://s.io/q/de"
    html = _tag("en", en) + _tag("de", de) + _tag("x-default", en)
    got = _run(spark, [(1, en, html), (2, de, html)])
    assert got[1]["cluster_id"] == en == got[2]["cluster_id"]


def test_no_preferred_lang_falls_back_to_min_url(spark):
    de, fr = "https://s.io/r/de", "https://s.io/r/fr"
    html = _tag("de", de) + _tag("fr", fr)
    got = _run(spark, [(1, de, html), (2, fr, html)])
    assert got[1]["is_keeper"] and not got[2]["is_keeper"]  # min url


def test_singleton_page_is_own_cluster_and_keeper(spark):
    got = _run(spark, [(1, "https://s.io/alone", "<p>no links</p>")])
    assert got[1]["cluster_id"] == "https://s.io/alone"
    assert got[1]["page_lang"] is None
    assert got[1]["n_alts"] == 0 and got[1]["is_keeper"]


def test_single_cluster_keyed_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "u", "<p></p>")], "doc_id long, url string, html string"
    )
    plan = hreflang.hreflang_clusters(df)._jdf.queryExecution() \
        .executedPlan().toString()
    # one aggregate exchange (election) — the join back may broadcast;
    # no exchange keyed by anything except cluster_id.
    import re
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert all("cluster_id" in l for l in exchanges), plan


def test_bitext_pairs(spark):
    en, de, fr = ("https://s.io/p/en", "https://s.io/p/de",
                  "https://s.io/p/fr")
    html = _tag("en", en) + _tag("de", de) + _tag("fr", fr)
    rows = [(1, en, html), (2, de, html), (3, fr, html),
            (4, "https://s.io/solo", "<p>none</p>")]
    df = spark.createDataFrame(rows, "doc_id long, url string, html string")
    out = hreflang.bitext_pairs(df)
    got = {(r["id_pivot"], r["id_other"]): r["lang_other"]
           for r in out.collect()}
    # en pivot pairs with de and fr; the solo page pairs with nothing
    assert got == {(1, 2): "de", (1, 3): "fr"}


def test_bitext_pairs_no_pivot_cluster_emits_nothing(spark):
    de, fr = "https://s.io/q/de", "https://s.io/q/fr"
    html = _tag("de", de) + _tag("fr", fr)
    df = spark.createDataFrame(
        [(1, de, html), (2, fr, html)],
        "doc_id long, url string, html string",
    )
    assert hreflang.bitext_pairs(df).count() == 0
