"""BPE inference (textops.bpe_encode): closed-form semantics + seeded
randomized parity against a plain-Python encoder driven by the
plain-Python trainer from test_bpe_train (three independent engines
once the contract gate's gaps-and-islands DuckDB twin is counted).
"""

from __future__ import annotations

import os
import random
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402
from test_bpe_train import _py_bpe  # noqa: E402


def _py_encode(texts, rules):
    out = []
    for i, t in enumerate(texts):
        ws = re.findall(r"[a-z]+", t.lower())
        n_tok = 0
        for w in ws:
            toks = list(w)
            for _step, lhs, rhs, _m, _c in rules:
                nxt, j = [], 0
                while j < len(toks):
                    if j + 1 < len(toks) and toks[j] == lhs and toks[j + 1] == rhs:
                        nxt.append(lhs + rhs)
                        j += 2
                    else:
                        nxt.append(toks[j])
                        j += 1
                toks = nxt
            n_tok += len(toks)
        n_ch = sum(len(w) for w in ws)
        out.append((i, len(ws), n_ch, n_tok,
                    n_tok * 1_000_000 // max(n_ch, 1)))
    return out


def _spark_encode(spark, texts, rules):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = textops.bpe_encode(df, [(r[1], r[2]) for r in rules])
    return sorted(
        (r["doc_id"], r["n_words"], r["n_chars"], r["n_tokens"],
         r["compression_ppm"])
        for r in got.collect()
    )


def test_bpe_encode_closed_form(spark):
    # corpus: 'aaab aaab ab' x2 + 'xy' ; merges learned: (a,a) then ...
    texts = ["aaab aaab ab", "aaab aaab ab", "xy"]
    rules = _py_bpe(texts, 2)
    # rule 1: (a,a) cnt 4; after merge: aaab->[aa,a,b], ab->[a,b]
    # rule 2 argmax: (a,b) cnt 6 (4 from aaab + 2 from ab) beats (aa,a) 4
    assert [(r[1], r[2]) for r in rules] == [("a", "a"), ("a", "b")]
    got = _spark_encode(spark, texts, rules)
    # 'aaab'->[aa,ab]=2 toks; 'ab'->[ab]=1; doc0: words 3, chars 10,
    # tokens 2+2+1=5, ppm=500000; 'xy' untouched: 1 word 2 chars 2 toks
    assert got == [
        (0, 3, 10, 5, 500_000),
        (1, 3, 10, 5, 500_000),
        (2, 1, 2, 2, 1_000_000),
    ]


def test_bpe_encode_empty_and_nonalpha_docs(spark):
    texts = ["aaab aaab", "12345 !!!", ""]
    rules = _py_bpe(texts, 1)
    got = _spark_encode(spark, texts, rules)
    assert got == _py_encode(texts, rules)
    assert got[1][1:] == (0, 0, 0, 0)  # digits-only doc: all zeros


def test_bpe_encode_randomized_parity(spark):
    rng = random.Random(77)
    syll = ["ab", "ba", "ca", "abc", "cab", "z"]
    texts = []
    for _ in range(60):
        words = [
            "".join(rng.choice(syll) for _ in range(rng.randint(1, 4)))
            for _ in range(rng.randint(0, 12))
        ]
        texts.append(" ".join(words))
    rules = _py_bpe(texts, 6)
    assert len(rules) == 6
    assert _spark_encode(spark, texts, rules) == _py_encode(texts, rules)
