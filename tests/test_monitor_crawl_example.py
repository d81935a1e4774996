"""Crawl-monitoring composition (examples/monitor_crawl.py): the
sketch family over a REAL engine catalog — per-round HLL registers
merging to exactly the whole-seen-table estimate, one-sided Count-Min
host estimates, and a bloom forecast whose probes are provably
disjoint from the members.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from crawler_spark import corpus, engine, rules  # noqa: E402
from crawler_spark.catalog import Catalog  # noqa: E402
from crawler_spark.functions import sketches  # noqa: E402
from examples.monitor_crawl import (  # noqa: E402
    bloom_forecast,
    distinct_url_report,
    heavy_pending_hosts,
)

N_HOSTS = 3


@pytest.fixture(scope="module")
def crawled_cat(spark):
    pages = tempfile.mkdtemp(prefix="mon_corpus_")
    corpus.write_corpus(spark, pages, n_hosts=N_HOSTS, n_filler=0)
    tasks = rules.synthetic_tasks(n_book_hosts=N_HOSTS, n_sun_hosts=N_HOSTS)
    cfg = engine.CrawlConfig(
        tasks=tasks,
        pages_path=pages,
        round_seconds=8,
        use_bloom=True,
        salt_buckets=4,
        max_rounds=2,  # stop early so frontier_pending is non-empty
    )
    cat = Catalog(tempfile.mkdtemp(prefix="mon_wh_"))
    engine.run_crawl(spark, cat, cfg)
    return cat


def test_round_registers_merge_to_whole_table_estimate(spark, crawled_cat):
    rep = {
        r["scope"]: (r["hll_est"], r["n_exact"])
        for r in distinct_url_report(spark, crawled_cat).collect()
    }
    assert "all" in rep and len(rep) >= 3  # >= 2 rounds + all
    # the merged-register estimate must equal sketching the whole
    # table directly (mergeability), computed here independently
    seen = crawled_cat.read(spark, "seen").select("url_norm")
    direct = sketches.hll_distinct(
        seen.withColumn("k", F.lit(0)), ["k"], "url_norm"
    ).collect()[0]["hll_est"]
    assert rep["all"][0] == direct
    # per-round exacts sum >= all-time exact (rounds are disjoint here)
    assert rep["all"][1] == sum(v[1] for s, v in rep.items() if s != "all")


def test_heavy_hosts_one_sided(spark, crawled_cat):
    rows = heavy_pending_hosts(spark, crawled_cat).collect()
    assert rows, "expected pending rows with max_rounds=2"
    for r in rows:
        assert r["cm_est"] >= r["exact_cnt"] > 0


def test_bloom_forecast_disjoint_and_bounded(spark, crawled_cat):
    row = bloom_forecast(spark, crawled_cat).collect()[0]
    assert row["n_probes"] > 0 and row["n_members"] > 0
    assert 0 <= row["n_false_pos"] <= row["n_probes"]
    assert 0 <= row["fpr_milli"] <= 1000
