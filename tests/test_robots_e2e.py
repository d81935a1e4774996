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


def test_parse_robots_py_groups():
    from crawler_spark.politeness import parse_robots_py

    txt = (
        "# comment\n"
        "User-agent: fancybot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: other\n"
        "User-agent: *\n"          # stacked header -> both agents
        "Disallow: /detail/\n"
        "Disallow:\n"              # empty = allow-all, ignored
        "Crawl-delay: 12\n"
        "Crawl-delay: nan-ish\n"   # non-numeric ignored, keeps 12
        "\n"
        "User-agent: fancybot\n"
        "Crawl-delay: 1\n"         # other agent's group: skipped
    )
    delay, prefixes = parse_robots_py(txt)
    assert delay == 12.0
    assert prefixes == ["/detail/"]
    # the named agent sees its own groups
    delay_f, prefixes_f = parse_robots_py(txt, user_agent="fancybot")
    assert delay_f == 1.0
    assert prefixes_f == ["/"]


def test_engine_robots_from_corpus_matches_oracle(spark, tmp_path):
    """Robots parsed out of the pages table itself (no pre-built robots
    parquet): engine == oracle given the closed-form robots twin."""
    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=N_HOSTS, n_filler=10, robots=True)

    # the parser recovers exactly the closed-form dict
    from crawler_spark.politeness import parse_robots_pages

    parsed = {
        r.host: (r.crawl_delay_s, list(r.disallow_prefixes))
        for r in parse_robots_pages(spark.read.parquet(pages_path)).collect()
    }
    assert parsed == corpus.robots_dict_for_hosts(N_HOSTS)

    tasks = rules.synthetic_tasks(
        max_depth=5, n_book_hosts=N_HOSTS, n_sun_hosts=N_HOSTS
    )
    cfg = engine.CrawlConfig(
        tasks=tasks, pages_path=pages_path, robots_from_corpus=True,
        round_seconds=ROUND_SECONDS, use_bloom=False, salt_buckets=1,
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
        robots=corpus.robots_dict_for_hosts(N_HOSTS),
    )
    engine_seen = {r.url_norm for r in cat.read(spark, "seen").collect()}
    assert engine_seen == orc.seen
    # /detail/ disallowed on even hosts -> no detail page of host000/002 seen
    assert not any(
        f"host{h:03d}.example.test/detail/" in u
        for u in engine_seen for h in range(0, N_HOSTS, 2)
    )
    log = cat.read(spark, "schedule_log")
    engine_order = [
        (r.round, r.priority, r.seq, r.url_norm)
        for r in log.orderBy("round", F.desc("priority"), "seq").collect()
    ]
    assert engine_order == orc.order
