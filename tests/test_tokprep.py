"""Tokenizer-training prep + encoding-quality gate kernels.

bpe_pair_counts: first BPE merge iteration (adjacent-pair counts
weighted by word frequency, pairs expanded over the distinct-word
table).  mojibake_stats: UTF-8-as-Latin-1 double-encoding detection.
Hand-computed expectations; the corpus-scale hash gate is the
bpe_pair_counts / mojibake_detect contract rows.
"""
from __future__ import annotations

import re

from pyspark.sql import functions as F

from crawler_spark.functions.textops import (
    MOJIBAKE_PATTERN,
    bpe_pair_counts,
    mojibake_stats,
)


def test_bpe_pair_counts_hand(spark):
    # words: aa(x1), ab(x2 across docs), b dropped (len<2)
    df = spark.createDataFrame(
        [(1, "aa ab"), (2, "ab B!")], ["doc_id", "text"]
    )
    rows = bpe_pair_counts(df, k=10).collect()
    got = [(r.pair, r.cnt, r.rank) for r in rows]
    assert got == [("ab", 2, 1), ("aa", 1, 2)]


def test_bpe_pair_counts_interior_pairs(spark):
    # 'abc' x3 -> pairs ab,bc each x3; 'bc' x1 -> bc x1
    df = spark.createDataFrame(
        [(1, "abc abc"), (2, "abc bc")], ["doc_id", "text"]
    )
    rows = bpe_pair_counts(df, k=10).collect()
    got = {(r.pair): (r.cnt, r.rank) for r in rows}
    assert got == {"bc": (4, 1), "ab": (3, 2)}


def test_bpe_tiebreak_and_k(spark):
    # equal counts break ties lexicographically; k truncates
    df = spark.createDataFrame([(1, "xy qr xy qr mn")], ["doc_id", "text"])
    rows = bpe_pair_counts(df, k=2).collect()
    assert [(r.pair, r.cnt, r.rank) for r in rows] == [
        ("qr", 2, 1),
        ("xy", 2, 2),
    ]


def test_mojibake_stats_counts(spark):
    dirty = "cafÃ© and â€™ and �"  # 3 hits
    clean = "plain ascii text"
    df = spark.createDataFrame(
        [(1, dirty), (2, clean), (3, "")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in mojibake_stats(df).collect()}
    assert rows[1].n_moji == 3 and rows[1].is_mojibake
    assert rows[1].n_chars == len(dirty)
    assert rows[1].moji_ppm == 3 * 1_000_000 // len(dirty)
    assert rows[2].n_moji == 0 and not rows[2].is_mojibake
    assert rows[2].moji_ppm == 0
    # empty text: guarded div, no null/NaN
    assert rows[3].n_chars == 0 and rows[3].moji_ppm == 0


def test_mojibake_pattern_python_regex_agrees(spark):
    # the same pattern string drives Spark (Java regex), DuckDB (RE2,
    # via the oracle), and Python re here — literal alternation with no
    # prefix conflicts, so all three count identically
    samples = [
        "naÃ¯ve",              # Ã + ¯: NOT in the list -> 0
        "Ã©Ã©x",     # ÃéÃé... 2 hits
        "aÂ·bÂ»c",   # Â· + Â» -> 2
        "quote â€œ ok",   # â€ matches (œ trailing) -> 1
    ]
    expected = [0, 2, 2, 1]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.n_moji for r in mojibake_stats(df).collect()
    }
    for i, (s, e) in enumerate(zip(samples, expected)):
        assert len(re.findall(MOJIBAKE_PATTERN, s)) == e
        assert got[i] == e


def test_mojibake_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = mojibake_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_script_ratios_labels_and_ties(spark):
    from crawler_spark.functions.textops import script_ratios

    rows = [
        (1, "hello world"),          # latin only
        (2, "привет hi"),  # cyr 6 > lat 2
        (3, "中文文本 test"),  # cjk 4 == lat 4 -> latin (tie)
        (4, "12345 !!!"),            # none
        (5, "가각갂"),   # hangul
        (6, ""),                     # empty -> none
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in script_ratios(df).collect()}
    assert got[1].script == "latin" and got[1].n_latin == 10
    assert got[2].script == "cyrillic" and got[2].n_cyrillic == 6
    assert got[3].script == "latin" and got[3].n_cjk == 4  # first-listed wins
    assert got[4].script == "none"
    assert got[5].script == "hangul" and got[5].n_hangul == 3
    assert got[6].script == "none"


def test_script_ratios_zero_shuffle(spark):
    from crawler_spark.functions.textops import script_ratios

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = script_ratios(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
