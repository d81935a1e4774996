"""Third-engine randomized parity, part 6 — the MinHash family:
signatures (md5-derived affine min-hashes replayed exactly in
Python), LSH banding/candidates, and the full band->verify
minhash_lsh_dedup output, on a random corpus with planted near-dups.
"""

from __future__ import annotations

import hashlib
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup  # noqa: E402


def _sh3(text):
    toks = text.split(" ")
    return ({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3 else set())


def _sig(shingles):
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
          for s in shingles]
    return [min((h * dedup.MH_A[i] + dedup.MH_B[i]) % (1 << 32)
                for h in hs)
            for i in range(dedup.N_HASHES)]


def _corpus(seed=20, docs=36):
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(40)]
    rows = []
    for d in range(docs):
        if d % 3 == 1 and rows:
            toks = rows[-1][1].split(" ")
            if len(toks) > 6:
                toks = toks[:]
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
        else:
            toks = [rng.choice(vocab) for _ in range(rng.randint(6, 30))]
        rows.append((d, " ".join(toks)))
    return rows


def test_minhash_signatures_vs_python(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.shingles(df, "doc_id")
    got = {r["doc"]: [r[f"mh_{i}"] for i in range(dedup.N_HASHES)]
           for r in dedup.minhash_signatures(sh).collect()}
    for d, t in rows:
        s = _sh3(t)
        if not s:
            assert d not in got
            continue
        assert got[d] == _sig(s), d


def test_minhash_lsh_dedup_vs_python(spark):
    rows = _corpus(seed=21, docs=40)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jac_micro"]
        for r in dedup.minhash_lsh_dedup(
            df, "doc_id", threshold_micro=400_000
        ).collect()
    }
    shs = {d: _sh3(t) for d, t in rows}
    sigs = {d: _sig(s) for d, s in shs.items() if s}
    rpb = dedup.ROWS_PER_BAND
    want = {}
    ds = sorted(sigs)
    for i, a in enumerate(ds):
        for b in ds[i + 1:]:
            banded = any(
                sigs[a][k * rpb:(k + 1) * rpb]
                == sigs[b][k * rpb:(k + 1) * rpb]
                for k in range(dedup.N_BANDS)
            )
            if not banded:
                continue
            inter = len(shs[a] & shs[b])
            union = len(shs[a]) + len(shs[b]) - inter
            if inter == 0:
                continue  # kernel's count(*) groupBy emits no 0 row
            jac = math.floor(inter * 1_000_000 / union)
            if jac >= 400_000:
                want[(a, b)] = jac
    assert got == want and want  # planted near-dups must surface
