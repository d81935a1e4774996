"""dedup.edit_near_pairs: FastSS/SymSpell deletion-neighborhood edit
join — closed-form semantics (substitution / indel hits, the "ab"/"ba"
distance-2 neighborhood false positive filtered, exact-dup collapse to
one dictionary entry) + seeded randomized parity against brute-force
Levenshtein over the distinct-title dictionary.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup  # noqa: E402


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, title string")
    return {
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in dedup.edit_near_pairs(df, "doc_id", "title", **kw).collect()
    }


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_pairs(rows, max_len=64):
    reps = {}
    for doc, title in rows:
        t = title.strip().lower()[:max_len]
        if t and (t not in reps or doc < reps[t]):
            reps[t] = doc
    out = set()
    items = list(reps.items())
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            (ta, da), (tb, db) = items[i], items[j]
            d = _lev(ta, tb)
            if d <= 1:
                out.add((min(da, db), max(da, db), d))
    return out


def test_substitution_and_indel_pairs(spark):
    rows = [
        (1, "Crawl Report Alpha"),
        (2, "crawl report alphb"),   # 1 substitution (case-folded)
        (3, "crawl report alph"),    # 1 deletion from doc 1
        (4, "totally different title"),
    ]
    got = _pairs(spark, rows)
    # 2 vs 3: "alphb" vs "alph" = 1 deletion -> also a pair
    assert got == {(1, 2, 1), (1, 3, 1), (2, 3, 1)}


def test_distance2_neighborhood_false_positive_filtered(spark):
    # "ab" and "ba" share deletion variants "a" and "b" but are
    # Levenshtein distance 2 — the verify filter must drop them.
    assert _pairs(spark, [(1, "ab"), (2, "ba")]) == set()


def test_exact_dups_collapse_to_one_dictionary_entry(spark):
    # 50 docs with the identical title produce ZERO pairs (one
    # dictionary entry), plus one near title pairing with the min rep.
    rows = [(i, "not found") for i in range(50)] + [(99, "not fund")]
    assert _pairs(spark, rows) == {(0, 99, 1)}


def test_max_len_truncation_merges_long_titles(spark):
    # identical first 64 chars -> same dictionary entry, no pair.
    base = "x" * 64
    rows = [(1, base + "AAA"), (2, base + "BBB")]
    assert _pairs(spark, rows) == set()


def test_randomized_parity(spark):
    rng = random.Random(606)
    for trial in range(3):
        rows = [
            (i, "".join(rng.choice("abc ") for _ in range(rng.randint(1, 6))))
            for i in range(rng.randint(8, 30))
        ]
        rows = [(i, t) for i, t in rows if t.strip()]
        assert _pairs(spark, rows) == _py_pairs(rows), f"t={trial}"


def test_bmp_unicode_parity(spark):
    # accented/CJK/Cyrillic (all BMP: one UTF-16 unit per char) match
    # the plain-Python char model exactly.
    rows = [
        (1, "café münchen"),
        (2, "cafe münchen"),   # é -> e substitution, dist 1
        (3, "café münchén"),   # second e accented, dist 1 from 1
        (4, "кафе москва"),
        (5, "кафе москв"),     # final char deleted, dist 1
        (6, "東京 新聞"),
        (7, "東京 新闻"),       # one CJK char substituted, dist 1
    ]
    got = _pairs(spark, rows)
    assert got == _py_pairs(rows)
    assert {(1, 2, 1), (1, 3, 1), (4, 5, 1), (6, 7, 1)} <= got
