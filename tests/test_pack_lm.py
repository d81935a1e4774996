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
