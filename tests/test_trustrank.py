"""graph.trustrank_micro: closed-form semantics (seed-only teleport,
spam-farm demotion, hand-computed two-iteration trust) + seeded
randomized parity against a plain-Python replay.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import graph  # noqa: E402


def _tr(spark, edges, seeds, iterations, damping=85):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(n,) for n in seeds], "node long")
    return {
        r["node"]: (r["trust_micro"], r["is_seed"])
        for r in graph.trustrank_micro(
            e, s, iterations=iterations, damping_pct=damping
        ).collect()
    }


def _py_tr(edges, seeds, iterations, damping=85):
    es = sorted(set(edges))
    nodes = sorted({a for e in es for a in e})
    deg = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    tele = (100 - damping) * 1_000_000 // 100
    trust = {n: (1_000_000 if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        csum = {n: 0 for n in nodes}
        for s, d in es:
            csum[d] += trust[s] // deg[s]
        trust = {
            n: (tele if n in seeds else 0) + damping * csum[n] // 100
            for n in nodes
        }
    return {n: (trust[n], n in seeds) for n in nodes}


def test_spam_farm_gets_zero_trust(spark):
    # trusted cycle 1->2->3->1, disconnected spam farm 4<->5.
    # iter1: t1=150000 (seed teleport), t2=floor(.85*1e6)=850000, rest 0
    # iter2: t1=150000, t2=floor(.85*150000)=127500,
    #        t3=floor(.85*850000)=722500; farm stays 0 forever —
    #        plain PageRank would hand 4 and 5 teleport mass every step
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 4)]
    got = _tr(spark, edges, [1], 2)
    assert got == {
        1: (150_000, True), 2: (127_500, False), 3: (722_500, False),
        4: (0, False), 5: (0, False),
    }


def test_out_degree_splits_trust(spark):
    # seed 1 links 2 and 3: each gets floor(1e6/2) then 85%
    got = _tr(spark, [(1, 2), (1, 3)], [1], 1)
    assert got[2] == (425_000, False) and got[3] == (425_000, False)
    assert got[1] == (150_000, True)


def test_randomized_parity(spark):
    rng = random.Random(404)
    for trial in range(3):
        n = rng.randint(6, 25)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        ]
        present = sorted({a for e in edges for a in e})
        seeds = rng.sample(present, k=max(1, len(present) // 4))
        it = rng.randint(1, 4)
        assert _tr(spark, edges, seeds, it) == _py_tr(
            edges, set(seeds), it
        ), f"trial={trial}"
