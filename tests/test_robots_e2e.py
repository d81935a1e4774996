"""End-to-end robots.txt enforcement: the engine with a robots table
must agree with the pure-Python oracle given the same rules —
disallowed prefixes never scheduled, crawl-delay budgets capped
(politeness.apply_robots + rank_by_budget vs oracle.crawl_oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark import corpus, engine, oracle, rules
from crawler_spark.catalog import Catalog
from crawler_spark.urlnorm import canon_py

N_HOSTS = 3
ROUND_SECONDS = 30.0

ROBOTS = [
    # host000: slow crawl-delay -> budget min(10, floor(30/12)) = 2
    ("host000.example.test", 12.0, []),
    # host001: /topic/ disallowed -> sun_room items never appear there
    ("host001.example.test", None, ["/topic/"]),
]


def test_engine_robots_matches_oracle(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=N_HOSTS, n_filler=10)
    robots_path = str(tmp_path / "robots")
    spark.createDataFrame(
        ROBOTS, "host string, crawl_delay_s double, disallow_prefixes array<string>"
    ).write.parquet(robots_path)

    tasks = rules.synthetic_tasks(
        max_depth=5, n_book_hosts=N_HOSTS, n_sun_hosts=N_HOSTS
    )
    cfg = engine.CrawlConfig(
        tasks=tasks, pages_path=pages_path, robots_path=robots_path,
        round_seconds=ROUND_SECONDS, use_bloom=False, salt_buckets=2,
    )
    cat = Catalog(str(tmp_path / "wh"))
    state = engine.run_crawl(spark, cat, cfg)
    assert state["finished"]

    pages = spark.read.parquet(pages_path).collect()
    corpus_dict = {canon_py(r.url): bytes(r.html) for r in pages}
    orc = oracle.crawl_oracle(
        tasks, corpus_dict, round_seconds=ROUND_SECONDS,
        min_body_bytes=cfg.min_body_bytes, ban_marker=cfg.ban_marker,
        max_attempts=cfg.max_attempts,
        robots={h: (d, p) for h, d, p in ROBOTS},
    )

    engine_seen = {r.url_norm for r in cat.read(spark, "seen").collect()}
    assert engine_seen == orc.seen
    # disallowed prefix never fetched
    assert not any("host001.example.test/topic/" in u for u in engine_seen)

    log = cat.read(spark, "schedule_log")
    engine_order = [
        (r.round, r.priority, r.seq, r.url_norm)
        for r in log.orderBy("round", F.desc("priority"), "seq").collect()
    ]
    assert engine_order == orc.order

    # crawl-delay cap: host000 never gets > floor(30/12)=2 per task-round
    per_round = (
        log.withColumn("host", F.regexp_extract("url_norm", r"://([^/]+)", 1))
        .where(F.col("host") == "host000.example.test")
        .groupBy("round")
        .count()
        .collect()
    )
    # two tasks share the host: cap is 2 per (task, host) -> <= 4 total
    assert all(r["count"] <= 4 for r in per_round)
