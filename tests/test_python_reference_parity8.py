"""Third-engine randomized parity, part 8 — containment pairs vs
brute force, corpus-global line boilerplate removal vs Python, and
benchmark decontamination vs a Python n-gram probe.
"""

from __future__ import annotations

import math
import os
import random
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup  # noqa: E402


def _sh3(text):
    toks = text.split(" ")
    return ({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3 else set())


def test_containment_pairs_vs_bruteforce(spark):
    rng = random.Random(24)
    vocab = [f"c{i}" for i in range(25)]
    rows = []
    for d in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(4, 30))]
        rows.append((d, " ".join(toks)))
        if d % 5 == 2:  # plant a short doc fully quoted inside d
            start = rng.randint(0, max(0, len(toks) - 6))
            rows.append((100 + d, " ".join(toks[start:start + 6])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_sub"], r["doc_sup"]): r["cont_micro"]
        for r in dedup.ngram_containment_pairs(
            df, "doc_id", threshold_micro=700_000, max_df=None
        ).collect()
    }
    sh = {d: _sh3(t) for d, t in rows}
    want = {}
    ds = sorted(sh)
    for a in ds:
        for b in ds:
            if a == b or not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            cm = math.floor(inter * 1_000_000 / len(sh[a]))
            if cm >= 700_000:
                want[(a, b)] = cm
    assert got == want and want  # planted quotes must surface


def test_drop_common_lines_vs_python(spark):
    rng = random.Random(25)
    pool = [f"line {i}" for i in range(8)]
    rows = []
    for d in range(50):
        ls = [rng.choice(pool) for _ in range(rng.randint(1, 5))]
        ls.append(f"own {d}")
        rng.shuffle(ls)
        rows.append((d, "\n".join(ls)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_text"])
           for r in dedup.drop_common_lines(df, "doc_id",
                                            min_docs=5).collect()}
    owners = defaultdict(set)
    for d, t in rows:
        for ln in t.split("\n"):
            owners[ln.strip()].add(d)
    for d, t in rows:
        ls = t.split("\n")
        kept = [l for l in ls if len(owners[l.strip()]) < 5]
        assert got[d] == (len(ls), len(kept), "\n".join(kept)), (d, t)


def test_contaminated_docs_vs_python(spark):
    rng = random.Random(26)
    vocab = [f"w{i}" for i in range(40)]
    bench = [(1000 + i, " ".join(rng.choice(vocab) for _ in range(12)))
             for i in range(5)]
    corpus = []
    for d in range(60):
        toks = [rng.choice(vocab) for _ in range(rng.randint(3, 40))]
        if d % 7 == 3:  # plant a verbatim eval quote (the leak case)
            src = rng.choice(bench)[1].split(" ")
            start = rng.randint(0, len(src) - 5)
            pos = rng.randint(0, len(toks))
            toks[pos:pos] = src[start:start + 5]
        corpus.append((d, " ".join(toks)))
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"]
           for r in dedup.contaminated_docs(cdf, bdf, min_hits=1)
           .collect()}
    bset = set().union(*[_sh3(t) for _, t in bench])
    want = {}
    for d, t in corpus:
        hits = len(_sh3(t) & bset)
        if hits >= 1:
            want[d] = hits
    assert got == want and want  # shared 40-token vocab guarantees hits
