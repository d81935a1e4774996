"""Crawl-equivalence gate (SURVEY.md §5 item 2, BASELINE.json north_rule):

the Spark engine and the pure-Python single-worker oracle must agree on
  1. the final URL-seen set (set equality),
  2. crawl order under the determinism contract (round, priority DESC,
     seq ASC),
  3. extracted items byte-for-byte,
  4. parked failures,
given the same seed list + politeness budget over the same corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark import corpus, engine, oracle, rules
from crawler_spark.catalog import Catalog


def _run_both(spark, tmp_path, *, salt_buckets, use_bloom, round_seconds=30.0,
              n_hosts=4, max_depth=5):
    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=n_hosts, n_filler=30)
    tasks = rules.synthetic_tasks(
        max_depth=max_depth, n_book_hosts=n_hosts, n_sun_hosts=max(1, n_hosts // 2)
    )
    cfg = engine.CrawlConfig(
        tasks=tasks, pages_path=pages_path, round_seconds=round_seconds,
        use_bloom=use_bloom, salt_buckets=salt_buckets,
    )
    cat = Catalog(str(tmp_path / "wh"))
    state = engine.run_crawl(spark, cat, cfg)
    assert state["finished"], "crawl did not drain the frontier"

    pages = spark.read.parquet(pages_path).collect()
    from crawler_spark.urlnorm import canon_py

    corpus_dict = {canon_py(r.url): bytes(r.html) for r in pages}
    orc = oracle.crawl_oracle(
        tasks, corpus_dict, round_seconds=round_seconds,
        min_body_bytes=cfg.min_body_bytes, ban_marker=cfg.ban_marker,
        max_attempts=cfg.max_attempts,
    )
    return cat, state, orc


@pytest.mark.parametrize(
    "salt_buckets,use_bloom", [(1, False), (2, True)],
    ids=["plain", "salted+bloom"],
)
def test_engine_matches_oracle(spark, tmp_path, salt_buckets, use_bloom):
    cat, state, orc = _run_both(
        spark, tmp_path, salt_buckets=salt_buckets, use_bloom=use_bloom
    )

    # 1. URL-seen set
    engine_seen = {r.url_norm for r in cat.read(spark, "seen").collect()}
    assert engine_seen == orc.seen

    # 2. crawl order: (round, priority DESC, seq ASC) over the schedule log
    log = (
        cat.read(spark, "schedule_log")
        .orderBy("round", F.desc("priority"), "seq")
        .collect()
    )
    engine_order = [(r.round, r.priority, r.seq, r.url_norm) for r in log]
    assert engine_order == orc.order

    # 3. items byte-for-byte
    eng_items = sorted(
        (r.task, r.rule, r.url, tuple(sorted((r.data or {}).items())))
        for r in cat.read(spark, "results").collect()
    )
    assert eng_items == sorted(orc.items)

    # 4. parked failures
    parked = (
        {r.url for r in cat.read(spark, "failures").collect()}
        if cat.exists("failures")
        else set()
    )
    from crawler_spark.urlnorm import canon_py

    assert {canon_py(u) for u in parked} == set(orc.parked)

    # 5. rounds agree
    assert state["round"] == orc.rounds + (0 if orc.rounds else 0)


def test_depth_cutoff(spark, tmp_path):
    """max_depth=1: details (depth 2) never fetched, tags (depth 1) are."""
    cat, state, orc = _run_both(
        spark, tmp_path, salt_buckets=1, use_bloom=False, max_depth=1
    )
    engine_seen = {r.url_norm for r in cat.read(spark, "seen").collect()}
    assert engine_seen == orc.seen
    assert not any("/detail/" in u for u in engine_seen)
    assert any("/tag/" in u for u in engine_seen)


def test_tight_budget_spills_rounds(spark, tmp_path):
    """round_seconds=6 -> budget 2/host/round: same final state, more
    rounds; politeness cap never exceeded per (task, host, round)."""
    cat, state, orc = _run_both(
        spark, tmp_path, salt_buckets=2, use_bloom=True, round_seconds=6.0
    )
    engine_seen = {r.url_norm for r in cat.read(spark, "seen").collect()}
    assert engine_seen == orc.seen
    log = cat.read(spark, "schedule_log")
    sched = (
        log.withColumn("host", F.regexp_extract("url_norm", r"://([^/]+)", 1))
        .groupBy("round", "host")
        .count()
    )
    # budget = floor(min(1/2, 20/60) * 6) = 2, two tasks can share a host
    assert sched.agg(F.max("count")).collect()[0][0] <= 2 * 2
    engine_order = [
        (r.round, r.priority, r.seq, r.url_norm)
        for r in log.orderBy("round", F.desc("priority"), "seq").collect()
    ]
    assert engine_order == orc.order
