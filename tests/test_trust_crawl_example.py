"""Trust-prioritized crawl composition (engine round_hook +
graph.trustrank_micro, examples/trust_crawl.py): trust mined from
cross-host links lifts pending priorities while schedule counts and
politeness stay reference-identical, and hosts unreachable from the
seed set (a disconnected spam pair) earn exactly zero trust.

The synthetic corpus links only intra-host, so the fixture appends a
few hub pages: a seed host endorses host002/host003, and two spam
hosts endorse only each other.
"""

from __future__ import annotations

import datetime
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark import corpus, engine, rules, urlnorm  # noqa: E402
from crawler_spark.catalog import Catalog  # noqa: E402
from examples.trust_crawl import host_trust, make_trust_hook  # noqa: E402

N_HOSTS = 4
ROUND_SECONDS = 8


def _fixture(spark):
    pages_path = tempfile.mkdtemp(prefix="trust_corpus_")
    corpus.write_corpus(spark, pages_path, n_hosts=N_HOSTS, n_filler=0)
    ts = datetime.datetime(2020, 1, 1)
    link = (
        '<a href="https://host002.example.test/">b</a>'
        '<a href="https://host003.example.test/">c</a>'
    )
    spam = '<a href="https://spam1.example.test/">s</a>'
    spam2 = '<a href="https://spam0.example.test/">s</a>'
    extra = spark.createDataFrame(
        [
            ("https://host000.example.test/hub", ts,
             f"<html><body>{link}</body></html>".encode(), None, None),
            ("https://spam0.example.test/", ts,
             f"<html><body>{spam}</body></html>".encode(), None, None),
            ("https://spam1.example.test/", ts,
             f"<html><body>{spam2}</body></html>".encode(), None, None),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    extra.write.mode("append").parquet(pages_path)
    return pages_path


def _seed_hosts():
    tasks = rules.synthetic_tasks(n_book_hosts=N_HOSTS, n_sun_hosts=N_HOSTS)
    return tasks, tuple(
        sorted({urlnorm.host_py(u) for t in tasks.values() for (u, _r, _p) in t.seeds})
    )


def _crawl(spark, pages_path, hook=None):
    tasks, _ = _seed_hosts()
    cfg = engine.CrawlConfig(
        tasks=tasks,
        pages_path=pages_path,
        round_seconds=ROUND_SECONDS,
        use_bloom=True,
        salt_buckets=4,
        max_rounds=2,
    )
    wh = tempfile.mkdtemp(prefix="trust_wh_")
    cat = Catalog(wh)
    engine.run_crawl(spark, cat, cfg, round_hook=hook)
    return cat.read(spark, "schedule_log").select(
        "round", "priority", "url_norm"
    ).collect()


def test_host_trust_flows_from_seeds_not_spam(spark):
    pages_path = _fixture(spark)
    _, seeds = _seed_hosts()
    pages = spark.read.parquet(pages_path).selectExpr(
        "url", "cast(html as string) as html"
    )
    got = {
        r["node"]: (r["trust_micro"], r["is_seed"])
        for r in host_trust(spark, pages, seeds, iterations=3).collect()
    }
    hh = lambda h: spark.sql(  # noqa: E731
        f"select xxhash64('{h}') as v"
    ).first()["v"]
    # endorsed hosts carry trust; the seed-disconnected spam pair is 0
    assert got[hh("host002.example.test")][0] > 0
    assert got[hh("host003.example.test")][0] > 0
    assert got[hh("spam0.example.test")] == (0, False)
    assert got[hh("spam1.example.test")] == (0, False)


def test_trust_hook_lifts_priority_politeness_unchanged(spark):
    pages_path = _fixture(spark)
    _, seeds = _seed_hosts()

    ctl = _crawl(spark, pages_path, hook=None)
    tr = _crawl(spark, pages_path, hook=make_trust_hook(pages_path, seeds))

    def per_round(log):
        out = {}
        for r in log:
            out[r["round"]] = out.get(r["round"], 0) + 1
        return out

    # politeness invariant: identical scheduled counts per round
    assert per_round(tr) == per_round(ctl)
    # the lift is real: endorsed-host rows scheduled with trust-scale
    # priority in the hooked run only
    lifted = [r for r in tr if r["priority"] > 1000]
    assert lifted, "trust hook must lift some scheduled priorities"
    assert not [r for r in ctl if r["priority"] > 1000]
