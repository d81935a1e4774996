"""Third-engine randomized parity, part 7 — the SimHash family (the
kernel the r3 verdict flagged as rewritten-after-its-driver-green):
signatures (md5-chunk twin replayed bit-exactly in Python, including
sign-sum ties and repeated-token weighting) and the chunk-blocked
near-pair output vs Python brute force.
"""

from __future__ import annotations

import hashlib
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup  # noqa: E402


def _py_chunks(text):
    toks = (text or "").split(" ")
    sums = [[0] * 16 for _ in range(4)]
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        for c in range(4):
            v = int(h[4 * c:4 * c + 4], 16)
            for j in range(16):
                sums[c][j] += ((v >> j) & 1) * 2 - 1
    return [
        sum(1 << j for j in range(16) if sums[c][j] > 0)
        for c in range(4)
    ]


def _corpus(seed, docs):
    rng = random.Random(seed)
    vocab = [f"sim{i}" for i in range(50)]
    rows = []
    for d in range(docs):
        if d % 3 == 1 and rows:
            toks = rows[-1][1].split(" ")
            toks = toks[:]
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        else:
            # repeated tokens on purpose: weighting must match
            toks = [rng.choice(vocab) for _ in range(rng.randint(4, 25))]
        rows.append((d, " ".join(toks)))
    rows.append((docs, ""))  # empty doc: one empty token, defined sig
    return rows


def test_simhash_chunks_vs_python(spark):
    rows = _corpus(22, 30)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: [r[f"ck_{c}"] for c in range(4)]
           for r in dedup.simhash_md5_chunks(df, "doc_id").collect()}
    for d, t in rows:
        assert got[d] == _py_chunks(t), (d, t)


def test_simhash_near_pairs_vs_python(spark):
    rows = _corpus(23, 34)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_md5_near_pairs(
            df, "doc_id", max_hamming=8
        ).collect()
    }
    cks = {d: _py_chunks(t) for d, t in rows}
    want = {}
    ds = sorted(cks)
    for i, a in enumerate(ds):
        for b in ds[i + 1:]:
            if not any(cks[a][c] == cks[b][c] for c in range(4)):
                continue  # chunk blocking: no shared 16-bit chunk
            ham = sum(bin(cks[a][c] ^ cks[b][c]).count("1")
                      for c in range(4))
            if ham <= 8:
                want[(a, b)] = ham
    assert got == want and want  # planted near-dups must block-match
