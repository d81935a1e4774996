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


def _components(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, ["a", "b"])
    return {
        r["node"]: r["component"]
        for r in graph.connected_components(df, **kw).collect()
    }


def test_connected_components_two_clusters(spark):
    # {1,2,3} via 1-2, 2-3 ; {10,11} ; isolated self-loop 20-20
    got = _components(spark, [(2, 1), (3, 2), (11, 10), (20, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_long_chain_converges(spark):
    # chain 0-1-2-...-12: diameter 12 forces >4 hash-min sweeps, and the
    # min label must still reach the far end (checkpointing included).
    chain = [(i, i + 1) for i in range(12)]
    got = _components(spark, chain)
    assert got == {i: 0 for i in range(13)}


def test_connected_components_iteration_cap_raises(spark):
    import pytest

    # pointer jumping doubles reach per sweep, so a cap of 2 needs a
    # chain well past 2^2+1 hops to be guaranteed unconverged.
    chain = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(chain, ["a", "b"])
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(df, max_iterations=2)


def test_keep_best_elects_one_per_component(spark):
    # components {1,2,3} and {10,11}; 20 is a singleton (no pairs).
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    scores = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4), (20, 1)],
        "doc_id long, score long",
    )
    out = {r.doc_id: r for r in graph.keep_best(pairs, scores).collect()}
    assert len(out) == 6
    # winner = max score, tie -> min id: component {1,2,3} -> 2 (9 ties 3, min id)
    assert out[2].kept and not out[1].kept and not out[3].kept
    assert out[10].kept and not out[11].kept  # tie 4,4 -> min id 10
    assert out[20].kept and out[20].component == 20  # singleton self-component
    assert out[1].component == out[2].component == out[3].component == 1


def test_resolve_redirects_chains_and_cycles(spark):
    # chain 5->4->3 (3 terminal), chain 9->8 (8 terminal),
    # cycle 20->21->22->20.
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (9, 8), (20, 21), (21, 22), (22, 20)],
        "src long, dst long",
    )
    out = {r.src: r for r in graph.resolve_redirects(edges).collect()}
    assert out[5].final == 3 and not out[5].is_cycle
    assert out[4].final == 3
    assert out[9].final == 8
    for u in (20, 21, 22):
        assert out[u].is_cycle and out[u].final is None


def test_resolve_redirects_long_chain_doubles(spark):
    # a 100-hop chain resolves within 8 doubling sweeps (2^8 >= 100)
    edges = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 101)], "src long, dst long"
    )
    out = graph.resolve_redirects(edges).collect()
    assert all(r.final == 0 and not r.is_cycle for r in out)
