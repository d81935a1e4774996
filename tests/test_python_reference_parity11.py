"""Third-engine randomized parity, part 11 — the two late-r5 kernels:
integer fixed-point HITS (random multigraphs incl. sinks, sources and
duplicate edges) and PMI collocation mining (random Zipf-ish word soup
with planted collocations).  Same discipline as parts 1-10: a seeded
random input, an independent plain-Python re-implementation of the
documented arithmetic, exact equality.
"""

from __future__ import annotations

import os
import random
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import graph, textops  # noqa: E402


# -------------------------------------------------------------- HITS
def _py_hits(edges, iterations):
    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    hub = {n: 1_000_000 for n in nodes}
    auth = {}
    for _ in range(iterations):
        asum = {n: 0 for n in nodes}
        for s, d in es:
            asum[d] += hub[s]
        mx = max(max(asum.values()), 1)
        auth = {n: asum[n] * 1_000_000 // mx for n in nodes}
        hsum = {n: 0 for n in nodes}
        for s, d in es:
            hsum[s] += auth[d]
        mx = max(max(hsum.values()), 1)
        hub = {n: hsum[n] * 1_000_000 // mx for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_micro_vs_python_random_graphs(spark):
    rng = random.Random(1105)
    for it in (1, 2, 3):
        n_nodes = rng.randint(5, 40)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(n_nodes, 4 * n_nodes))
        ]
        # force a pure sink and a pure source into the graph
        edges += [(0, n_nodes), (n_nodes + 1, 0)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: (r["hub_micro"], r["auth_micro"])
            for r in graph.hits_micro(df, iterations=it).collect()
        }
        assert got == _py_hits(edges, it), f"iterations={it}"


# ------------------------------------------------------- PMI mining
def _py_pmi(texts, min_count, k):
    docs = [
        [w for w in re.split(r"[^a-z]+", t.lower()) if w] for t in texts
    ]
    uni: Counter = Counter(w for ws in docs for w in ws)
    pairs: Counter = Counter(
        p for ws in docs for p in zip(ws, ws[1:])
    )
    n = sum(uni.values())
    out = []
    for (w1, w2), pc in pairs.items():
        if pc < min_count:
            continue
        cond = pc * 1_000_000 // uni[w1]
        lift = cond * n // uni[w2]
        out.append((w1, w2, pc, uni[w1], uni[w2], lift))
    out.sort(key=lambda r: (-r[5], -r[2], r[0], r[1]))
    return [r + (i + 1,) for i, r in enumerate(out[:k])]


def test_pmi_collocations_vs_python_random_corpus(spark):
    rng = random.Random(1106)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(120):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
        if rng.random() < 0.4:
            words += ["data", "lake"]      # planted collocation
        if rng.random() < 0.25:
            words += ["data", "set"]       # shared-head competitor
        rng.shuffle(words)
        texts.append(" ".join(words) + (" 42!" if rng.random() < 0.3 else ""))
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for mc, k in ((2, 10), (5, 20)):
        got = [
            (r["w1"], r["w2"], r["pair_cnt"], r["cnt1"], r["cnt2"],
             r["lift_ppm"], r["rank"])
            for r in textops.pmi_collocations(df, min_count=mc, k=k).collect()
        ]
        want = _py_pmi(texts, mc, k)
        assert got == want, f"min_count={mc}"
        assert len(want) > 3  # the synthesis must actually exercise top-k
