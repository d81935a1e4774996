"""textops.zipf_ratio_profile: closed-form ranks/ratios on a corpus
with hand-placed frequencies (ties broken by term), truncation when 2r
falls outside the vocabulary, and randomized plain-Python parity.
"""

from __future__ import annotations

import math
import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


def _spark(spark, texts, ranks=(1, 2, 4, 8, 16, 32)):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return {
        r["r"]: (r["freq_r"], r["freq_2r"], r["ratio_milli"])
        for r in textops.zipf_ratio_profile(df, "text", ranks).collect()
    }


def _py(texts, ranks=(1, 2, 4, 8, 16, 32)):
    import re

    c = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                c[w] += 1
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {}
    for r in ranks:
        if 2 * r <= len(ordered):
            fr, f2 = ordered[r - 1][1], ordered[2 * r - 1][1]
            out[r] = (fr, f2, math.floor(fr * 1000 / f2))
    return out


def test_closed_form_ratios(spark):
    # freqs: a x8, b x4, c x4, d x2 -> rank order a,b,c,d (tie b<c)
    texts = ["a " * 8, "b " * 4, "c " * 4, "d d"]
    got = _spark(spark, texts, ranks=(1, 2))
    # r=1: freq(1)=8 vs freq(2)=4 -> 2000 milli; r=2: 4 vs 2 -> 2000
    assert got == {1: (8, 4, 2000), 2: (4, 2, 2000)}


def test_probe_dropped_when_2r_exceeds_vocab(spark):
    texts = ["alpha beta gamma"]  # vocab = 3 -> only r=1 valid
    got = _spark(spark, texts, ranks=(1, 2, 4))
    assert set(got) == {1}


def test_randomized_parity(spark):
    rng = random.Random(111)
    words = [f"w{i}" for i in range(120)]
    for trial in range(3):
        texts = [
            " ".join(rng.choices(words, weights=range(1, 121), k=200))
            for _ in range(rng.randint(3, 10))
        ]
        assert _spark(spark, texts) == _py(texts), f"t={trial}"
