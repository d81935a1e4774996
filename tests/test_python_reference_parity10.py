"""Third-engine randomized parity, part 10 — the two mixed-script
contract kernels without a prior plain-Python tier: Unicode-script mix
detection (over genuinely multi-script random text) and the
competitive bigram-LM language ID (full train+score replay).  Same
discipline as parts 1-9.
"""

from __future__ import annotations

import os
import random
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


# --------------------------------------------------------- script mix
def test_script_ratios_vs_python(spark):
    rng = random.Random(21)
    pools = {
        "latin": "abcXYZéßő",
        "cyrillic": "абвГД",
        "cjk": "中文あカ",
        "arabic": "ابت",
        "hangul": "가나다",
        "other": "123 .,!—\U0001f600",  # digits/punct/astral: no script
    }
    rows = []
    for i in range(150):
        chars = []
        for _ in range(rng.randint(0, 40)):
            chars.append(rng.choice(pools[rng.choice(list(pools))]))
        rows.append((i, "".join(chars)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_latin"], r["n_cyrillic"], r["n_cjk"],
                         r["n_arabic"], r["n_hangul"], r["script"])
           for r in textops.script_ratios(df).collect()}
    classes = [(n, re.compile(c)) for n, c in textops.SCRIPT_CLASSES]
    for i, t in rows:
        counts = [len(p.findall(t)) for _, p in classes]
        script = "none"
        best = 0
        for (name, _), c in zip(classes, counts):
            if c > best:  # first-listed wins ties
                best, script = c, name
        assert got[i] == (*counts, script), repr(t)
    # the random mix must actually exercise multi-script rows and ties
    multi = sum(
        1 for i, t in rows
        if sum(1 for _, p in classes if p.search(t)) >= 2
    )
    assert multi > 20


# ---------------------------------------------------------- lang_id_lm
def _py_lang_id(train, score):
    """Independent replay: dict-based bigram models + argmax scoring."""
    c2: Counter = Counter()
    for lang, text in train:
        ws = [w for w in re.split(r"\s+", text.lower())]
        for a, b in zip(ws, ws[1:]):
            c2[(lang, a, b)] += 1
    c1: Counter = Counter()
    for (lang, a, _b), n in c2.items():
        c1[(lang, a)] += n
    model = {
        (a, b): {}
        for (_l, a, b) in c2
    }
    for (lang, a, b), n in c2.items():
        model[(a, b)][lang] = n * 1_000_000 // c1[(lang, a)]
    out = {}
    for doc, text in score:
        ws = [w for w in re.split(r"\s+", text.lower())]
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            continue
        sums: Counter = Counter()
        for bg in bgs:
            for lang, p in model.get(bg, {}).items():
                sums[lang] += p
        if not sums:
            continue  # no model matches any bigram: kernel emits no row
        # score is floor(sum/n); ties break lexicographically
        scored = sorted(
            ((lang, s // len(bgs)) for lang, s in sums.items()),
            key=lambda kv: (-kv[1], kv[0]))
        lang, sc = scored[0]
        out[doc] = (lang, sc, len(bgs))
    return out


def test_lang_id_lm_vs_python(spark):
    rng = random.Random(22)
    vocab = {
        "en": ["the", "cat", "sat", "on", "mat", "dog", "runs"],
        "de": ["der", "hund", "läuft", "auf", "dem", "weg", "katze"],
        "fr": ["le", "chat", "est", "sur", "la", "table", "chien"],
    }
    # shared words force cross-language bigram collisions
    shared = ["info", "web", "data"]
    train, score = [], []
    for lang, ws in vocab.items():
        for _ in range(30):
            n = rng.randint(2, 10)
            toks = [rng.choice(ws + shared) for _ in range(n)]
            train.append((lang, " ".join(toks)))
    for i in range(80):
        lang = rng.choice(list(vocab))
        n = rng.randint(1, 12)  # n=1 -> zero bigrams -> excluded
        toks = [rng.choice(vocab[lang] + shared) for _ in range(n)]
        score.append((i, " ".join(toks)))
    tdf = spark.createDataFrame(train, "lang string, text string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    got = {r["doc_id"]: (r["pred_lang"], r["score_micro"], r["n_bigrams"])
           for r in textops.lang_id_lm(tdf, sdf).collect()}
    exp = _py_lang_id(train, score)
    assert got == exp
    # sanity: the models must be discriminative on this corpus
    correct = sum(
        1 for i, text in score
        if i in exp and any(w in text for w in vocab[exp[i][0]])
    )
    assert correct > len(exp) * 0.7
