"""graph.seed_hops (synchronous BFS from a seed set) and
graph.cocitation_pairs (source-inverted co-citation with the
out-degree stop cap): closed-form semantics + randomized parity
against plain-Python BFS / brute-force co-citation counting.
"""

from __future__ import annotations

import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import graph  # noqa: E402


def _hops(spark, edges, seeds, max_hops=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(n,) for n in seeds], "node long")
    return {
        r["node"]: r["hops"]
        for r in graph.seed_hops(e, s, max_hops=max_hops).collect()
    }


def _py_hops(edges, seeds, max_hops=3):
    es = sorted(set(edges))
    nodes = sorted({a for e in es for a in e})
    hops = {n: (0 if n in seeds else None) for n in nodes}
    for k in range(1, max_hops + 1):
        reached = {d for s, d in es if hops[s] == k - 1}
        for n in reached:
            if hops[n] is None:
                hops[n] = k
    return {n: (-1 if h is None else h) for n, h in hops.items()}


def _cocite(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r["host_a"], r["host_b"]): r["cocite"]
        for r in graph.cocitation_pairs(e, **kw).collect()
    }


def _py_cocite(edges, min_count=2, max_out_degree=64):
    es = sorted(set(edges))
    od = Counter(s for s, _ in es)
    c = Counter()
    for s, d1 in es:
        if od[s] > max_out_degree:
            continue
        for s2, d2 in es:
            if s2 == s and od[s2] <= max_out_degree and d1 < d2:
                c[(d1, d2)] += 1
    return {p: n for p, n in c.items() if n >= min_count}


def test_bfs_closed_form(spark):
    # chain 0->1->2->3->4 with seed 0, max_hops 3: node 4 unreached
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    assert _hops(spark, edges, [0]) == {0: 0, 1: 1, 2: 2, 3: 3, 4: -1}


def test_bfs_min_over_two_seeds(spark):
    # 5 is 1 hop from seed 9 but 2 from seed 0 — min wins
    edges = [(0, 1), (1, 5), (9, 5)]
    got = _hops(spark, edges, [0, 9])
    assert got[5] == 1 and got[1] == 1


def test_cocite_closed_form_and_stop_cap(spark):
    # sources 10,11 both cite (1,2); source 12 has out-degree 3 > cap
    edges = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2), (12, 3)]
    got = _cocite(spark, edges, min_count=2, max_out_degree=2)
    assert got == {(1, 2): 2}  # source 12 capped out entirely


def test_randomized_parity(spark):
    rng = random.Random(212)
    for trial in range(3):
        n = rng.randint(6, 20)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        ]
        seeds = [rng.randrange(n)]
        mh = rng.randint(1, 4)
        assert _hops(spark, edges, seeds, mh) == _py_hops(
            edges, set(seeds), mh
        ), f"hops t={trial}"
        assert _cocite(spark, edges, min_count=1, max_out_degree=3) == (
            _py_cocite(edges, 1, 3)
        ), f"cocite t={trial}"
