"""fetch_mode='http' — the production fetch seam (fetch.fetch_http).

The sandbox has no network, so the transport is faked; the assertions
are about the ENGINE semantics the seam must preserve (reference
collect/collect.go:33-91): UA/proxy/cookie reach the transport, non-200
and transport errors become fetch misses (retry -> park), and a full
http-mode crawl over a transport serving the synthetic corpus produces
artifacts bit-identical to the corpus-join mode.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from crawler_spark import corpus, engine, rules
from crawler_spark.catalog import Catalog
from crawler_spark.fetch import fetch_http
from crawler_spark.urlnorm import canon_py

SCHED_SCHEMA = (
    "url string, url_norm string, host string, task_name string"
)


def _sched(spark, rows):
    return spark.createDataFrame(rows, SCHED_SCHEMA)


def test_kernel_passes_ua_proxy_cookie(spark):
    # local def: cloudpickle serializes closures by VALUE (a module-level
    # test function would pickle by reference and fail on executors)
    def echo_transport(url, ua, proxy, cookie, timeout_s):
        return 200, f"{ua}|{proxy}|{cookie}|{timeout_s}".encode()

    df = _sched(spark, [
        ("http://h0.example.test/a", "http://h0.example.test/a", "h0.example.test", "t1"),
        ("http://h1.example.test/b", "http://h1.example.test/b", "h1.example.test", "t2"),
    ])
    out = fetch_http(
        df, cookies={"t1": "session=abc"}, proxies=("http://p0:80", "http://p1:80"),
        timeout_s=7.0, transport=echo_transport,
    ).collect()
    assert len(out) == 2
    by_task = {r.task_name: bytes(r.html).decode() for r in out}
    ua1, proxy1, cookie1, to1 = by_task["t1"].split("|")
    assert re.match(r"^Mozilla/5\.0 ", ua1)  # fetchopts UA family
    assert proxy1 in ("http://p0:80", "http://p1:80")
    assert cookie1 == "session=abc"
    assert to1 == "7.0"
    # t2 has no cookie configured -> transport sees None
    assert by_task["t2"].split("|")[2] == "None"
    for r in out:
        assert r.http_status == 200
        assert r.body_bytes == len(bytes(r.html))


def test_kernel_drops_non_200_and_transport_errors(spark):
    def tp(url, ua, proxy, cookie, timeout_s):
        if url.endswith("/404"):
            return 404, b"not found"
        if url.endswith("/boom"):
            raise OSError("connection reset")
        return 200, b"<html>ok body</html>"

    df = _sched(spark, [
        ("http://h.test/ok", "http://h.test/ok", "h.test", "t"),
        ("http://h.test/404", "http://h.test/404", "h.test", "t"),
        ("http://h.test/boom", "http://h.test/boom", "h.test", "t"),
    ])
    out = fetch_http(df, transport=tp).collect()
    assert [r.url for r in out] == ["http://h.test/ok"]
    assert bytes(out[0].html) == b"<html>ok body</html>"


def test_http_mode_crawl_matches_corpus_mode(spark, tmp_path):
    """Same tasks, same pages: fetch_mode='http' over a transport that
    serves the corpus must produce the SAME seen set, crawl order,
    items, and parked failures as the corpus-join mode."""
    pages_path = str(tmp_path / "pages")
    corpus.write_corpus(spark, pages_path, n_hosts=4, n_filler=30)
    tasks = rules.synthetic_tasks(max_depth=4, n_book_hosts=4, n_sun_hosts=2)

    cat_a = Catalog(str(tmp_path / "wh_corpus"))
    cfg_a = engine.CrawlConfig(tasks=tasks, pages_path=pages_path)
    state_a = engine.run_crawl(spark, cat_a, cfg_a)
    assert state_a["finished"]

    served = {
        canon_py(r.url): bytes(r.html)
        for r in spark.read.parquet(pages_path).collect()
    }

    def tp(url, ua, proxy, cookie, timeout_s):
        body = served.get(canon_py(url))
        if body is None:
            return 404, b""
        return 200, body

    cat_b = Catalog(str(tmp_path / "wh_http"))
    cfg_b = engine.CrawlConfig(
        tasks=tasks, pages_path=pages_path,
        fetch_mode="http", fetch_transport=tp,
    )
    state_b = engine.run_crawl(spark, cat_b, cfg_b)
    assert state_b["finished"]
    assert state_b["round"] == state_a["round"]

    def artifacts(cat):
        seen = {r.url_norm for r in cat.read(spark, "seen").collect()}
        log = (
            cat.read(spark, "schedule_log")
            .orderBy("round", F.desc("priority"), "seq").collect()
        )
        order = [(r.round, r.priority, r.seq, r.url_norm) for r in log]
        items = sorted(
            (r.task, r.rule, r.url, tuple(sorted((r.data or {}).items())))
            for r in cat.read(spark, "results").collect()
        )
        parked = (
            {r.url for r in cat.read(spark, "failures").collect()}
            if cat.exists("failures") else set()
        )
        return seen, order, items, parked

    assert artifacts(cat_b) == artifacts(cat_a)
