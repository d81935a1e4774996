"""Trained quality classifier (textops.train_quality_perceptron):
unit semantics + third-engine randomized parity (Spark epochs vs an
independent plain-Python batch perceptron — the DuckDB oracle is the
second engine, checked by the contract gate).
"""

from __future__ import annotations

import hashlib
import os
import random
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


def _bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _py_perceptron(texts, n_buckets=16, epochs=4, label_mult=5):
    docs = []
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z]+", t.lower()) if x]
        if not toks:
            continue
        nstop = sum(1 for x in toks if x in textops.PERCEPTRON_STOPWORDS)
        y = 1 if nstop * label_mult >= len(toks) else -1
        feats = Counter(_bucket(x, n_buckets) for x in toks)
        docs.append((i, y, feats))
    w = [0] * n_buckets
    out = []
    for ep in range(1, epochs + 1):
        mis = [
            (y, feats)
            for _, y, feats in docs
            if y * sum(w[b] * c for b, c in feats.items()) <= 0
        ]
        delta = Counter()
        for y, feats in mis:
            for b, c in feats.items():
                delta[b] += y * c
        for b, d in delta.items():
            w[b] += d
        out.extend((ep, b, w[b], len(mis)) for b in range(n_buckets))
    return out


def _spark_rows(spark, texts, n_buckets=16, epochs=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r["epoch"], r["bucket"], r["w"], r["n_mis"])
        for r in textops.train_quality_perceptron(
            df, n_buckets=n_buckets, epochs=epochs
        )
        .orderBy("epoch", "bucket")
        .collect()
    ]


def test_epoch1_updates_all(spark):
    # w0 = 0 -> every doc has margin 0 -> ALL misclassified in epoch 1
    texts = ["the cat sat on the mat", "zebra quagga xylophone kumquat"]
    rows = _spark_rows(spark, texts, n_buckets=8, epochs=1)
    assert all(r[3] == 2 for r in rows)  # n_mis = both docs
    # delta = sum of y*x: doc0 is stopword-dense (y=+1), doc1 sparse
    # (y=-1); weights must be nonzero somewhere
    assert any(r[2] != 0 for r in rows)


def test_label_split(spark):
    # both classes must be populated on prose-vs-spam style input
    texts = [
        "the cat is on the mat and it is a cat",   # stopword-dense -> +1
        "buy cheap widgets best price widgets sale discount offer",  # -> -1
    ]
    exp = _py_perceptron(texts, n_buckets=8, epochs=2)
    got = _spark_rows(spark, texts, n_buckets=8, epochs=2)
    assert got == exp


def test_randomized_parity(spark):
    rng = random.Random(2026)
    vocab = ["cat", "dog", "run", "jump", "blue", "tree", "fish", "rock",
             "wind", "fire"] + list(textops.PERCEPTRON_STOPWORDS)
    texts = []
    for _ in range(60):
        n = rng.randint(1, 20)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    texts.append("")          # empty doc: excluded from training
    texts.append("...!!!")    # tokenless doc: excluded from training
    got = _spark_rows(spark, texts, n_buckets=16, epochs=4)
    exp = _py_perceptron(texts, n_buckets=16, epochs=4)
    assert got == exp
    # training must actually converge downward on this separable-ish set
    n_mis = sorted({(r[0], r[3]) for r in got})
    assert n_mis[-1][1] <= n_mis[0][1]
