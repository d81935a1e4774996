"""Closed-form unit tests for graph.pagerank_micro: hand-computed
two-iteration ranks on a 3-node graph, and checkpoint-path equivalence
(localCheckpoint truncation must not change the result).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import graph  # noqa: E402


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["rank_micro"]
        for r in graph.pagerank_micro(df, **kw).collect()
    }


def test_pagerank_micro_closed_form(spark):
    # 1 -> 2, 2 -> 1, 3 -> 1 ; all out-degrees 1
    # iter1: r(1)=150000+85%*2e6=1850000, r(2)=1000000, r(3)=150000
    # iter2: r(1)=150000+85%*(1000000+150000)=1127500
    #        r(2)=150000+85%*1850000=1722500, r(3)=150000
    edges = [(1, 2), (2, 1), (3, 1)]
    assert _ranks(spark, edges, iterations=1) == {
        1: 1_850_000, 2: 1_000_000, 3: 150_000,
    }
    assert _ranks(spark, edges, iterations=2) == {
        1: 1_127_500, 2: 1_722_500, 3: 150_000,
    }


def test_pagerank_micro_checkpoint_invariant(spark):
    edges = [(i % 7, (i * 3 + 1) % 7) for i in range(30)]
    plain = _ranks(spark, edges, iterations=5, checkpoint_every=100)
    ckpt = _ranks(spark, edges, iterations=5, checkpoint_every=2)
    assert plain == ckpt
