"""hashed_linear_score (fastText/CCNet-shape hashed linear classifier):
kernel output must equal a pure-Python recompute of the closed-form
bucket/weight/floor-mean chain, including negative-sum floor division
and the empty-document edge."""

from __future__ import annotations

import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


def _weight_py(tok: str, n_buckets: int = 4096, seed: str = "q") -> int:
    bucket = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets
    w = int(hashlib.md5(f"{seed}|{bucket}".encode()).hexdigest()[:8], 16)
    return w % 2001 - 1000


def _score_py(text: str, threshold: int = 0) -> tuple[int, int, bool]:
    toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
    if not toks:
        return 0, 0, 0 > threshold
    s = sum(_weight_py(t) for t in toks)
    mean = s // len(toks)  # python // floors, matching (s - pmod(s,n))/n
    return len(toks), mean, mean > threshold


def test_matches_python_recompute(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "",
        "Hello, WORLD!  123 mixed-CASE punctuation...",
        "zq zq zq zq",  # repeated rare token
        "a",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_toks, r.score_micro, r.keep)
        for r in textops.hashed_linear_score(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _score_py(t), (i, t, got[i], _score_py(t))


def test_negative_floor_division(spark):
    # find a token with a negative weight so the sum is negative and the
    # floor (not truncation toward zero) branch is exercised
    neg = next(
        t for t in ("aa", "ab", "ac", "ad", "ae", "af", "ag") if _weight_py(t) < 0
    )
    pos = next(
        t for t in ("ba", "bb", "bc", "bd", "be", "bf", "bg") if _weight_py(t) > 0
    )
    # two tokens with sum odd and negative -> -k//2 != int(-k/2)
    text = f"{neg} {neg} {pos}"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = textops.hashed_linear_score(df).collect()[0]
    n, mean, keep = _score_py(text)
    assert row.score_micro == mean
    s = sum(_weight_py(t) for t in text.split())
    if s < 0 and s % 3:
        assert row.score_micro < s / 3  # floored below the real quotient


def test_threshold_parameter(spark):
    df = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    lo = textops.hashed_linear_score(df, threshold_micro=-10**9).collect()[0]
    hi = textops.hashed_linear_score(df, threshold_micro=10**9).collect()[0]
    assert lo.keep and not hi.keep


def test_property_random_texts(spark):
    """Batch property check: one Spark job over many adversarial random
    texts (unicode, punctuation-only, huge tokens) == the pure-Python
    twin.  Seeded, not hypothesis-per-example: a Spark job per example
    would dominate the suite."""
    import random

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz ABC!?.,;:0123456789\t\né中"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200)))
        for _ in range(200)
    ]
    texts += ["!!!", " ", "中文文本", "a" * 5000]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_toks, r.score_micro, r.keep)
        for r in textops.hashed_linear_score(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _score_py(t), (i, repr(t[:50]))
