"""Closed-form unit tests for the two r5-born kernels: graph.hits_micro
(hand-computed two-iteration hub/authority scores on a 3-node graph) and
textops.pmi_collocations (hand-computed PMI lift on a 4-doc corpus,
including the zero-token-row guard).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import graph, textops  # noqa: E402


def _hits(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in graph.hits_micro(df, **kw).collect()
    }


def test_hits_micro_closed_form_one_iteration(spark):
    # 1 -> 2, 1 -> 3, 2 -> 3 : node 1 is the hub, node 3 the authority.
    # a_sum = (0, 1e6, 2e6), max 2e6 -> auth = (0, 500000, 1000000)
    # h_sum = (1.5e6, 1e6, 0), max 1.5e6 -> hub = (1000000, 666666, 0)
    edges = [(1, 2), (1, 3), (2, 3)]
    assert _hits(spark, edges, iterations=1) == {
        1: (1_000_000, 0),
        2: (666_666, 500_000),
        3: (0, 1_000_000),
    }


def test_hits_micro_closed_form_two_iterations(spark):
    # iter2 on the same graph:
    # a_sum = (0, 1e6, 1666666), max 1666666
    #   -> auth = (0, floor(1e12/1666666)=600000, 1000000)
    # h_sum = (1.6e6, 1e6, 0), max 1.6e6
    #   -> hub = (1000000, floor(1e12/1.6e6)=625000, 0)
    edges = [(1, 2), (1, 3), (2, 3)]
    assert _hits(spark, edges, iterations=2) == {
        1: (1_000_000, 0),
        2: (625_000, 600_000),
        3: (0, 1_000_000),
    }


def test_hits_micro_duplicate_edges_collapse(spark):
    # duplicated edge rows must not double mass (edges are distinct'd)
    once = _hits(spark, [(1, 2), (1, 3), (2, 3)], iterations=2)
    dup = _hits(spark, [(1, 2), (1, 2), (1, 3), (2, 3), (2, 3)], iterations=2)
    assert once == dup


def _pmi(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [
        (r["w1"], r["w2"], r["pair_cnt"], r["cnt1"], r["cnt2"],
         r["lift_ppm"], r["rank"])
        for r in textops.pmi_collocations(df, **kw).collect()
    ]


def test_pmi_collocations_closed_form(spark):
    # tokens: new=3 york=3 city=1 the=2 cat=1 dog=1 ; N=11
    # pairs: (new,york)=3 survives min_count=2; lift =
    #   floor(floor(3e6/3) * 11 / 3) = floor(1e6*11/3) = 3666666
    rows = _pmi(
        spark,
        ["new york new york", "new york city", "the cat the dog"],
        min_count=2,
        k=5,
    )
    assert rows == [("new", "york", 3, 3, 3, 3_666_666, 1)]


def test_pmi_collocations_zero_token_rows_and_order(spark):
    # a digits-only doc tokenizes to an empty array (slice guard), and
    # ties on lift break by pair_cnt desc then (w1, w2) asc
    rows = _pmi(
        spark,
        ["ab cd ab cd", "ab cd", "ef gh ef gh", "ef gh", "12345 678"],
        min_count=2,
        k=5,
    )
    # both pairs: cnt=3, cnt1=cnt2=3, N=12 -> lift=floor(1e6*12/3)=4e6
    assert rows == [
        ("ab", "cd", 3, 3, 3, 4_000_000, 1),
        ("ef", "gh", 3, 3, 3, 4_000_000, 2),
    ]


def test_pmi_collocations_min_count_prunes(spark):
    rows = _pmi(spark, ["one two three four"], min_count=2, k=5)
    assert rows == []
