"""Quality-classifier inference (textops.infer_quality_perceptron):
decision-boundary semantics + third-engine randomized parity (Spark
scoring vs an independent plain-Python perceptron inference — the
DuckDB oracle replay is the second engine, checked by the contract
gate).
"""

from __future__ import annotations

import os
import random
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402
from tests.test_quality_train import _bucket, _py_perceptron  # noqa: E402


def _py_infer(texts, n_buckets=16, epochs=4, label_mult=5):
    traj = _py_perceptron(texts, n_buckets, epochs, label_mult)
    w = [0] * n_buckets
    for ep, b, wb, _n in traj:
        if ep == epochs:
            w[b] = wb
    out = []
    for i, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z]+", t.lower()) if x]
        if not toks:
            continue
        nstop = sum(1 for x in toks if x in textops.PERCEPTRON_STOPWORDS)
        y = 1 if nstop * label_mult >= len(toks) else -1
        feats = Counter(_bucket(x, n_buckets) for x in toks)
        s = sum(w[b] * c for b, c in feats.items())
        pred = 1 if s > 0 else -1
        out.append((i, s, pred, y, 1 if pred == y else 0))
    return sorted(out)


def _spark_infer(spark, texts, n_buckets=16, epochs=4):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return sorted(
        (r["doc"], r["score"], r["pred"], r["y"], r["correct"])
        for r in textops.infer_quality_perceptron(
            df, n_buckets=n_buckets, epochs=epochs
        ).collect()
    )


def test_boundary_and_exclusions(spark):
    # zero-margin docs are pred=-1 (score > 0 is the +1 side — the
    # trainer's own misclassified convention); tokenless docs excluded
    texts = ["the cat sat on the mat", "zebra quagga xylophone", "", "!!!"]
    got = _spark_infer(spark, texts, n_buckets=8, epochs=1)
    assert [r[0] for r in got] == [0, 1]  # empty/tokenless dropped
    for _doc, score, pred, _y, corr in got:
        assert pred == (1 if score > 0 else -1)
        assert corr in (0, 1)


def test_randomized_parity(spark):
    rng = random.Random(2027)
    vocab = ["cat", "dog", "run", "jump", "blue", "tree", "fish", "rock",
             "wind", "fire"] + list(textops.PERCEPTRON_STOPWORDS)
    texts = []
    for _ in range(60):
        n = rng.randint(1, 20)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n)))
    texts.append("")
    got = _spark_infer(spark, texts, n_buckets=16, epochs=4)
    exp = _py_infer(texts, n_buckets=16, epochs=4)
    assert got == exp
    # on a separable-ish corpus the trained model should beat coin-flip
    acc = sum(r[4] for r in got) / len(got)
    assert acc > 0.5
