"""Third-engine randomized parity, part 5 — the graph and shingle
heavyweights: connected_components vs a Python union-find,
pagerank_micro vs a Python integer fixed-point replay, and
ngram_jaccard_pairs vs Python brute force.  All three are
integer-exact by design, so equality is total, not approximate.
"""

from __future__ import annotations

import math
import os
import random
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup, graph  # noqa: E402


def test_connected_components_vs_union_find(spark):
    rng = random.Random(17)
    # sparse random graph + a long path (exercises pointer jumping)
    edges = set()
    for _ in range(120):
        a, b = rng.randint(0, 79), rng.randint(0, 79)
        if a != b:
            edges.add((a, b))
    for i in range(100, 140):  # path of 41 nodes, diameter 40
        edges.add((i, i + 1))
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    got = {r["node"]: r["component"]
           for r in graph.connected_components(df).collect()}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = defaultdict(lambda: 1 << 62)
    nodes = {n for e in edges for n in e}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min[r], n)
    want = {n: comp_min[find(n)] for n in nodes}
    assert got == want


def test_pagerank_vs_python_fixed_point(spark):
    rng = random.Random(18)
    edges = set()
    for _ in range(200):
        a, b = rng.randint(0, 49), rng.randint(0, 49)
        if a != b:
            edges.add((a, b))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r["node"]: r["rank_micro"]
           for r in graph.pagerank_micro(df, iterations=3).collect()}
    nodes = {n for e in edges for n in e}
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    rank = {n: 1_000_000 for n in nodes}
    teleport = 15 * 1_000_000 // 100
    for _ in range(3):
        csum = defaultdict(int)
        for s, d in edges:
            csum[d] += math.floor(rank[s] / deg[s])
        rank = {n: teleport + math.floor(85 * csum[n] / 100)
                for n in nodes}
    assert got == rank


def test_ngram_jaccard_vs_bruteforce(spark):
    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(40):
        n = rng.randint(3, 25)
        toks = [rng.choice(vocab) for _ in range(n)]
        if d % 4 == 1:  # near-duplicate of the previous doc
            prev = rows[-1][1].split(" ")
            toks = prev[:]
            if len(toks) > 4:
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jac_micro"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", threshold_micro=300_000, max_df=None
        ).collect()
    }
    sh = {}
    for d, t in rows:
        toks = t.split(" ")
        sh[d] = {" ".join(toks[i:i + 3])
                 for i in range(len(toks) - 2)} if len(toks) >= 3 else set()
    want = {}
    for a in range(40):
        for b in range(a + 1, 40):
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            jac = math.floor(
                inter * 1_000_000 / (len(sh[a]) + len(sh[b]) - inter))
            if jac >= 300_000:
                want[(a, b)] = jac
    assert got == want and want  # non-vacuous: near-dups planted
