"""Checkpoint/resume: stop after round k, resume, final tables identical
(SURVEY.md §5 item 4).  Also covers rollback of a torn (uncommitted)
round: table snapshots newer than the committed state are discarded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark import corpus, engine, rules
from crawler_spark.catalog import Catalog


def _cfg(pages_path, tasks):
    return engine.CrawlConfig(
        tasks=tasks, pages_path=pages_path, round_seconds=12.0,
        use_bloom=True, salt_buckets=2,
    )


def _snapshot_tables(spark, cat):
    out = {}
    for t in ("seen", "results", "schedule_log", "failures"):
        if cat.exists(t):
            rows = cat.read(spark, t).drop("ts").collect()
            out[t] = sorted(map(str, rows))
    return out


def test_stop_and_resume_identical(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=3, n_filler=10)
    tasks = rules.synthetic_tasks(n_book_hosts=3, n_sun_hosts=2)

    # uninterrupted reference run
    cat_a = Catalog(str(tmp_path / "wh_a"))
    engine.run_crawl(spark, cat_a, _cfg(pages_path, tasks))
    want = _snapshot_tables(spark, cat_a)

    # interrupted run: 2 rounds, then a fresh process resumes
    cat_b = Catalog(str(tmp_path / "wh_b"))
    cfg = _cfg(pages_path, tasks)
    pages_prepared = engine.prepare_pages(spark.read.parquet(pages_path))
    state = engine.bootstrap(spark, cat_b, cfg)
    for _ in range(2):
        if state["finished"]:
            break
        state = engine.run_round(spark, cat_b, cfg, state, pages_prepared, None)
    assert not state["finished"]

    # simulate a torn write after the last committed round
    torn = cat_b.read(spark, "seen").limit(1).withColumn("round", F.lit(99))
    cat_b.write(torn, "seen")

    state2 = engine.resume(cat_b)
    assert state2["round"] == state["round"]
    assert not cat_b.read(spark, "seen").where(F.col("round") == 99).count()
    while not state2["finished"] and state2["round"] < cfg.max_rounds:
        state2 = engine.run_round(spark, cat_b, cfg, state2, pages_prepared, None)

    assert _snapshot_tables(spark, cat_b) == want


def test_stop_and_resume_identical_cuckoo(spark, tmp_path):
    """Resume with the long-lived cuckoo seen-filter: run_crawl rebuilds
    the filter from the seen table on resume; final tables must equal
    the uninterrupted run's."""
    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=3, n_filler=10)
    tasks = rules.synthetic_tasks(n_book_hosts=3, n_sun_hosts=2)

    def cfg(max_rounds=64):
        return engine.CrawlConfig(
            tasks=tasks, pages_path=pages_path, round_seconds=12.0,
            use_bloom=True, salt_buckets=2, seen_filter="cuckoo",
            bloom_min_seen=1, max_rounds=max_rounds,
        )

    cat_a = Catalog(str(tmp_path / "wh_a"))
    engine.run_crawl(spark, cat_a, cfg())
    want = _snapshot_tables(spark, cat_a)

    cat_b = Catalog(str(tmp_path / "wh_b"))
    state = engine.run_crawl(spark, cat_b, cfg(max_rounds=2))
    assert not state["finished"]
    state2 = engine.run_crawl(spark, cat_b, cfg(), do_resume=True)
    assert state2["finished"]
    assert _snapshot_tables(spark, cat_b) == want
