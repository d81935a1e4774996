"""Third-engine randomized parity, part 4 — url_features (pre-fetch
URL admission gate) and readability_scores (Flesch-Kincaid milli
fixed-point, where Python floats ARE IEEE doubles so floor() must
agree bit-for-bit).
"""

from __future__ import annotations

import math
import os
import random
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops, urlfeat  # noqa: E402


def test_url_features_vs_python(spark):
    rng = random.Random(15)
    urls = []
    for i in range(150):
        sub = ".".join("s" for _ in range(rng.randint(0, 3)))
        host = (sub + "." if sub else "") + f"ex{i % 7}.com"
        depth = rng.randint(0, 10)
        segs = "/".join(
            rng.choice(["a", "2024", "item9", "x%20y", "p123456789"])
            for _ in range(depth)
        )
        q = "&".join(
            f"k{j}={rng.randint(0, 99)}" for j in range(rng.randint(0, 5))
        )
        url = f"https://{host}/{segs}" + (f"?{q}" if q else "")
        urls.append((i, url))
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {r["doc_id"]: r.asDict()
           for r in urlfeat.url_features(df).collect()}
    for i, url in urls:
        host = re.match(r"^[a-z]+://([^/?#]+)", url).group(1)
        pm = re.match(r"^[a-z]+://[^/?#]+([^?#]*)", url)
        path = pm.group(1) if pm else ""
        qm = re.search(r"\?([^#]*)", url)
        query = qm.group(1) if qm else ""
        n_params = 0 if query == "" else query.count("&") + 1
        n_digits = sum(c.isdigit() and c.isascii() for c in url)
        digit_ppm = n_digits * 1_000_000 // len(url)
        g = got[i]
        assert g["url_len"] == len(url)
        assert g["path_depth"] == path.count("/"), url
        assert g["n_query_params"] == n_params
        assert g["digit_ppm"] == digit_ppm
        assert g["pct_encoded"] == url.count("%")
        assert g["n_subdomains"] == max(host.count(".") - 1, 0)
        spam = (len(url) > 120 or digit_ppm > 300_000
                or n_params > 3 or path.count("/") > 8)
        assert g["url_spam"] == spam, url


def test_readability_vs_python(spark):
    rng = random.Random(16)
    texts = []
    words = ["the", "syllable", "onomatopoeia", "a", "rhythm", "try",
             "beautiful", "queueing", "strength", "io"]
    for _ in range(120):
        n = rng.randint(1, 60)
        toks = [rng.choice(words) for _ in range(n)]
        # sprinkle sentence punctuation and double spaces
        s = ""
        for t in toks:
            s += t + rng.choice([" ", " ", "  ", ". ", "?! ", "... "])
        texts.append(s.strip())
    texts.append("")          # empty doc: the greatest(...,1) floors
    texts.append("!!!")       # punctuation only
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict()
           for r in textops.readability_scores(df).collect()}
    for i, t in enumerate(texts):
        n_words = len(re.findall(r"[^ ]+", t))
        n_sents = max(len(re.findall(r"[.!?]+", t)), 1)
        n_syl = len(re.findall(r"[aeiouy]+", t.lower()))
        w = max(n_words, 1)
        grade = math.floor(390.0 * w / n_sents + 11800.0 * n_syl / w
                           - 15590.0)
        ease = math.floor(206835.0 - 1015.0 * w / n_sents
                          - 84600.0 * n_syl / w)
        g = got[i]
        assert g["n_words"] == n_words and g["n_sentences"] == n_sents
        assert g["n_syllables"] == n_syl
        assert g["fk_grade_milli"] == grade, repr(t)
        assert g["reading_ease_milli"] == ease, repr(t)
