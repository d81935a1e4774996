"""Smoke test for examples/build_corpus.py: the composed funnel runs at
sf0.001, produces deterministic stage counts, and the shard assignment
is a valid partition (contiguous 0-based positions per shard)."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

_EX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "build_corpus.py",
)
spec = importlib.util.spec_from_file_location("build_corpus_example", _EX)
build_corpus = importlib.util.module_from_spec(spec)
spec.loader.exec_module(build_corpus)


def test_build_corpus_funnel(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out, counts = build_corpus.build(
        spark, docs, budget_tokens=2000, n_shards=4
    )
    # funnel is monotone non-increasing and ends non-empty
    order = ["input", "encoding_gate", "soft404_gate", "badwords_gate",
             "quality_gate", "gopher_gate", "exact_dedup", "near_dedup",
             "token_budget", "output"]
    vals = [counts[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert counts["input"] == 500 and counts["output"] > 0
    assert counts["token_budget"] < counts["near_dedup"]  # budget binds

    rows = out.select("doc_id", "split", "shard", "pos").collect()
    assert {r.split for r in rows} <= {"train", "dev", "test"}
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert 0 <= shard < 4
        assert sorted(poss) == list(range(len(poss)))  # contiguous 0-based

    # kept token mass respects the budget
    kept_tokens = (
        docs.join(out.select("doc_id"), "doc_id", "left_semi")
        .select(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()[0].t
    )
    assert kept_tokens <= 2000
