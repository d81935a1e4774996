"""graph.opic_micro: closed-form semantics (cash conservation through
the virtual node, dangling redistribution, hand-computed two-round
state) + seeded randomized parity against a plain-Python replay of the
batch-synchronous OPIC recurrence (Abiteboul et al., WWW'03).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import graph  # noqa: E402


def _opic(spark, edges, iterations):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: (r["cash_micro"], r["hist_micro"], r["importance_micro"])
        for r in graph.opic_micro(e, iterations=iterations).collect()
    }


def _py_opic(edges, iterations):
    es = sorted(set(edges))
    nodes = sorted({a for e in es for a in e})
    n = len(nodes)
    deg = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    cash = {m: 1_000_000 for m in nodes}
    hist = {m: 0 for m in nodes}
    for _ in range(iterations):
        vshare = sum(c for m, c in cash.items() if m not in deg) // n
        gsum = {m: 0 for m in nodes}
        for s, d in es:
            gsum[d] += cash[s] // deg[s]
        hist = {m: hist[m] + cash[m] for m in nodes}
        cash = {m: gsum[m] + vshare for m in nodes}
    return {m: (cash[m], hist[m], cash[m] + hist[m]) for m in nodes}


def test_two_round_closed_form(spark):
    # 1->2, 1->3, 2->1; node 3 dangling (pays the virtual node).
    # round 1: vshare = floor(1e6/3) = 333333
    #   gives: 1 splits 1e6 over {2,3} -> 500000 each; 2 sends 1e6 to 1
    #   cash:  1: 1000000+333333   2: 500000+333333   3: 500000+333333
    #   hist:  all 1000000
    # round 2: vshare = floor(833333/3) = 277777
    #   gives: 1 splits 1333333 -> 666666 each; 2 sends 833333 to 1
    #   cash:  1: 833333+277777=1111110  2: 944443  3: 944443
    #   hist:  1: 2333333  2: 1833333  3: 1833333
    got = _opic(spark, [(1, 2), (1, 3), (2, 1)], 2)
    assert got == {
        1: (1_111_110, 2_333_333, 3_444_443),
        2: (944_443, 1_833_333, 2_777_776),
        3: (944_443, 1_833_333, 2_777_776),
    }


def test_no_dangling_conserves_cash_exactly(spark):
    # pure cycle, every degree 1: cash just rotates, no floor loss,
    # vshare always 0 — total cash is conserved exactly.
    edges = [(1, 2), (2, 3), (3, 1)]
    got = _opic(spark, edges, 3)
    assert sum(c for c, _, _ in got.values()) == 3_000_000
    # symmetric cycle: every node identical state
    assert len({v for v in got.values()}) == 1


def test_hub_outranks_leaf(spark):
    # star: everyone links to 0, 0 links back to 1 only; 0 accumulates
    # the whole graph's flow and must dominate the importance order.
    edges = [(1, 0), (2, 0), (3, 0), (0, 1)]
    got = _opic(spark, edges, 3)
    assert got[0][2] == max(v[2] for v in got.values())
    assert got[2][2] == got[3][2]  # symmetric leaves tie


def test_randomized_parity(spark):
    rng = random.Random(505)
    for trial in range(3):
        n = rng.randint(5, 22)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        ]
        it = rng.randint(1, 4)
        assert _opic(spark, edges, it) == _py_opic(edges, it), f"t={trial}"
