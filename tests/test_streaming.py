"""Streaming consumers over engine snapshot tables: the file-stream tail
must see exactly what a batch read sees (AvailableNow == batch), and the
watermarked window agg must produce the batch-equivalent counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark import corpus, engine, rules, streaming
from crawler_spark.catalog import Catalog


def _small_crawl(spark, tmp_path):
    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=2, n_filler=10)
    tasks = rules.synthetic_tasks(max_depth=5, n_book_hosts=2, n_sun_hosts=1)
    cfg = engine.CrawlConfig(tasks=tasks, pages_path=pages_path, use_bloom=False)
    cat = Catalog(str(tmp_path / "wh"))
    state = engine.run_crawl(spark, cat, cfg)
    assert state["finished"]
    return cat


def test_stream_tail_equals_batch(spark, tmp_path):
    cat = _small_crawl(spark, tmp_path)
    batch = {
        (r.task, r.rule, r.url)
        for r in cat.read(spark, "results").collect()
    }
    tail = streaming.run_to_memory(
        streaming.stream_table(spark, cat, "results"), "t_results_tail"
    )
    got = {(r.task, r.rule, r.url) for r in tail.collect()}
    assert got == batch
    assert len(tail.collect()) == cat.read(spark, "results").count()


def test_windowed_items_equal_batch_agg(spark, tmp_path):
    cat = _small_crawl(spark, tmp_path)
    stream = streaming.stream_table(spark, cat, "results")
    win = streaming.run_to_memory(
        streaming.items_per_window(stream, window="1 minute"), "t_results_win"
    )
    got = {
        (r.task, r.rule): r.n_items
        for r in win.groupBy("task", "rule").agg(
            F.sum("n_items").alias("n_items")
        ).collect()
    }
    want = {
        (r.task, r.rule): r.cnt
        for r in cat.read(spark, "results")
        .groupBy("task", "rule").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want
