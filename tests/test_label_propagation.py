"""graph.label_propagation: closed-form semantics (adoption, min-label
tie-break, seed clamping, unreached nulls, synchronous updates) +
seeded randomized parity against a plain-Python replay.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import graph  # noqa: E402


def _lp(spark, edges, seeds, iterations):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "node long, label long")
    return {
        r["node"]: (r["label"], r["is_seed"])
        for r in graph.label_propagation(e, s, iterations=iterations).collect()
    }


def _py_lp(edges, seeds, iterations):
    es = {(a, b) for a, b in edges if a != b}
    und = es | {(b, a) for a, b in es}
    nodes = {a for a, _ in und}
    sd = {}
    for n, l in seeds:
        sd[n] = min(sd.get(n, l), l)
    labels = {n: sd.get(n) for n in nodes}
    for _ in range(iterations):
        votes: dict = {}
        for a, b in und:
            lb = labels[b]
            if lb is not None:
                votes.setdefault(a, {}).setdefault(lb, 0)
                votes[a][lb] += 1
        nxt = {}
        for n in nodes:
            if n in sd:
                nxt[n] = sd[n]
            elif n in votes:
                nxt[n] = min(votes[n], key=lambda l: (-votes[n][l], l))
            else:
                nxt[n] = labels[n]
        labels = nxt
    return {n: (labels[n], n in sd) for n in nodes}


def test_path_propagation_and_tie_break(spark):
    # 1-2-3-4-5 path, seeds at the ends; after 2 iters node 3 sees a
    # 1-vs-1 tie between labels 10 and 20 -> min label 10 wins
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    seeds = [(1, 10), (5, 20)]
    assert _lp(spark, edges, seeds, 2) == {
        1: (10, True), 2: (10, False), 3: (10, False),
        4: (20, False), 5: (20, True),
    }


def test_seed_clamped_against_hostile_neighborhood(spark):
    edges = [(1, 2), (1, 3), (1, 4)]
    seeds = [(1, 5), (2, 1), (3, 1), (4, 1)]
    got = _lp(spark, edges, seeds, 3)
    assert got[1] == (5, True)  # 3 neighbors vote 1; clamp holds


def test_unreached_nodes_stay_null_and_sync_updates(spark):
    # component 6-7 has no seed -> null labels; 2-3 gets the label only
    # after it reaches 2 first (synchronous: one hop per iteration)
    edges = [(1, 2), (2, 3), (6, 7)]
    seeds = [(1, 9)]
    it1 = _lp(spark, edges, seeds, 1)
    assert it1[2] == (9, False) and it1[3] == (None, False)
    it2 = _lp(spark, edges, seeds, 2)
    assert it2[3] == (9, False)
    assert it2[6] == (None, False) and it2[7] == (None, False)


def test_randomized_parity(spark):
    rng = random.Random(2026)
    for trial in range(3):
        n = rng.randint(8, 30)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        ]
        seeds = [
            (rng.randrange(n), rng.randrange(4))
            for _ in range(rng.randint(1, max(2, n // 3)))
        ]
        # seeds must be graph nodes (kernel domain = edge endpoints)
        present = {a for e in edges for a in e if e[0] != e[1]}
        seeds = [(s, l) for s, l in seeds if s in present] or [
            (next(iter(present)), 0)
        ]
        it = rng.randint(1, 4)
        assert _lp(spark, edges, seeds, it) == _py_lp(edges, seeds, it), (
            f"trial={trial}"
        )
