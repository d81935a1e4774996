"""Closed-form unit tests for textops.pack_sequences (chunk-boundary
straddle, per-shard independence) and textops.bigram_lm_scores (exact
micro-probabilities on a hand-computable corpus).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


def test_pack_sequences_straddle_and_shards(spark):
    # shard 'x': 3 + 4 + 6 tokens at seq_len=5 ->
    #   doc 1: off 0,  [0,0]   doc 2: off 3, ends at 6 -> [0,1] straddle
    #   doc 3: off 7, ends at 12 -> [1,2]
    # shard 'y' restarts at offset 0 regardless of doc ids
    rows = [
        (1, "x", "a b c"),
        (2, "x", "a b c d"),
        (3, "x", "a b c d e f"),
        (9, "y", "a b c d e f g"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in textops.pack_sequences(df, seq_len=5).collect()
    }
    assert (got[1]["first_chunk"], got[1]["last_chunk"], got[1]["n_chunks"]) == (0, 0, 1)
    assert (got[2]["first_chunk"], got[2]["last_chunk"], got[2]["n_chunks"]) == (0, 1, 2)
    assert (got[3]["first_chunk"], got[3]["last_chunk"], got[3]["n_chunks"]) == (1, 2, 2)
    assert (got[9]["first_chunk"], got[9]["last_chunk"], got[9]["n_chunks"]) == (0, 1, 2)


def test_bigram_lm_scores_closed_form(spark):
    # corpus bigrams: (a,b) x3  (b,a) x2  (b,c) x1
    #   c1(a)=3 -> p(b|a)=1.000000
    #   c1(b)=3 -> p(a|b)=666666 micro, p(c|b)=333333 micro
    rows = [
        (1, "a b a b a b"),  # bigrams: ab,ba,ab,ba,ab -> 3x1e6 + 2x666666
        (2, "b c"),          # one bigram: bc -> 333333
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in textops.bigram_lm_scores(df).collect()
    }
    assert got[1]["n_bigrams"] == 5
    assert got[1]["lm_score_micro"] == (3 * 1_000_000 + 2 * 666_666) // 5
    assert got[2]["n_bigrams"] == 1
    assert got[2]["lm_score_micro"] == 333_333


def test_lang_id_lm_predicts_planted_languages(spark):
    from crawler_spark.functions import textops

    train = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "en"),
            (2, "the dog sat on the rug", "en"),
            (3, "le chat dort sur le tapis", "fr"),
            (4, "le chien dort sur le lit", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    score = spark.createDataFrame(
        [
            (10, "the cat sat on the rug"),
            (11, "le chat dort sur le lit"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textops.lang_id_lm(train, score).collect()}
    assert got[10].pred_lang == "en"
    assert got[11].pred_lang == "fr"
    assert got[10].n_bigrams == 5 and got[11].n_bigrams == 5
    # zero cross-language vocabulary -> the losing model never scores;
    # each winner's score is the mean of its matched micro-probs
    assert 0 < got[10].score_micro <= 1_000_000


def test_lang_id_lm_coverage_beats_lucky_hits(spark):
    """A model matching 1 of many bigrams with p=1.0 must lose to a
    model matching all bigrams at moderate p: n_bigrams is the
    denominator for every language."""
    from crawler_spark.functions import textops

    train = spark.createDataFrame(
        [
            # lang A: exactly one bigram of the test doc, deterministic (p=1)
            (1, "alpha beta", "A"),
            # lang B: all of the test doc's vocabulary, twice for spread
            (2, "alpha beta gamma delta epsilon", "B"),
            (3, "alpha gamma beta delta epsilon", "B"),
        ],
        "doc_id long, text string, lang string",
    )
    score = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    got = textops.lang_id_lm(train, score).collect()[0]
    assert got.pred_lang == "B"


def test_gopher_quality_rules_fire_individually(spark):
    from crawler_spark.functions import textops

    docs = spark.createDataFrame(
        [
            (1, "normal sensible english words written here nicely"),
            (2, "## ### # ...... # ... # word"),          # symbol ratio
            (3, "12 34 56 78 90 11 22 33"),               # no alpha words
            (4, "- one\n- two\n- three"),                 # all bullets
            (5, "end one...\nend two...\nplain line"),    # 2/3 ellipsis
            (6, "a b c d e f g h i j"),                   # mean word len 1
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in textops.gopher_quality(docs).collect()}
    assert got[1].keep
    assert not got[2].keep and got[2].symbol_ratio_micro > 100_000
    assert not got[3].keep and got[3].alpha_word_frac_micro == 0
    assert not got[4].keep and got[4].bullet_frac_micro == 1_000_000
    assert not got[5].keep and got[5].ellipsis_frac_micro == 666_666
    assert not got[6].keep and got[6].mean_word_len_micro == 1_000_000
