"""Focused-crawl composition (engine round_hook +
anchors.focused_priority, examples/focused_crawl.py): under politeness
budget pressure the hook spends each host's budget on on-topic links
first, while schedule counts, politeness, and the hookless path stay
reference-identical.

The synthetic corpus is the natural fixture: sun_room topic pages link
live topics with anchor text '主题 N 讨论' and dead links with
'dead link N' — a lexicon of ('主题',) scores the live ones 1e6 and the
dead ones 0.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark import corpus, engine, rules  # noqa: E402
from crawler_spark.catalog import Catalog  # noqa: E402
from examples.focused_crawl import make_focus_hook  # noqa: E402

N_HOSTS = 4
ROUND_SECONDS = 8  # budget = min(8/2, 8*20/60) = 2 per (task, host)


def _crawl(spark, pages_path, hook=None):
    cfg = engine.CrawlConfig(
        tasks=rules.synthetic_tasks(
            n_book_hosts=N_HOSTS, n_sun_hosts=N_HOSTS
        ),
        pages_path=pages_path,
        round_seconds=ROUND_SECONDS,
        use_bloom=True,
        salt_buckets=4,
        max_rounds=2,
    )
    wh = tempfile.mkdtemp(prefix="focused_wh_")
    cat = Catalog(wh)
    engine.run_crawl(spark, cat, cfg, round_hook=hook)
    log = cat.read(spark, "schedule_log").select("round", "priority",
                                                 "url_norm")
    pend = cat.read(spark, "frontier_pending").select("url_norm")
    return log.collect(), pend.collect()


def test_focused_hook_spends_budget_on_topic(spark):
    pages_path = tempfile.mkdtemp(prefix="focused_corpus_")
    corpus.write_corpus(spark, pages_path, n_hosts=N_HOSTS, n_filler=0)

    ctl_log, ctl_pend = _crawl(spark, pages_path, hook=None)
    foc_log, foc_pend = _crawl(
        spark, pages_path,
        hook=make_focus_hook(pages_path, ("主题",)),
    )

    # politeness unchanged: identical scheduled counts per round
    def per_round(log):
        out = {}
        for r in log:
            out[r["round"]] = out.get(r["round"], 0) + 1
        return out

    assert per_round(foc_log) == per_round(ctl_log)

    # round-2 topic picks: every focused pick is an on-topic (t*) topic
    # with the lifted priority; dead links (zz*) wait in the frontier
    foc_r2_topics = [r for r in foc_log
                     if r["round"] == 2 and "/topic/" in r["url_norm"]]
    assert foc_r2_topics, "round 2 must schedule topic URLs"
    assert all("/topic/t" in r["url_norm"] for r in foc_r2_topics)
    assert all(r["priority"] == 1_000_000 for r in foc_r2_topics)
    # ...and the budget was genuinely contended: dead links exist and
    # remain unscheduled in the focused run
    foc_pend_urls = {r["url_norm"] for r in foc_pend}
    assert any("/topic/zz" in u for u in foc_pend_urls)
    foc_sched_urls = {r["url_norm"] for r in foc_log}
    assert not any("/topic/zz" in u for u in foc_sched_urls)

    # the hook only reorders: the focused round-2 topic picks are a
    # same-size subset of each host's candidates the control also saw
    ctl_sched_urls = {r["url_norm"] for r in ctl_log}
    assert len(foc_sched_urls) == len(ctl_sched_urls)

    # control (reference semantics, priority 0) picks by seq order —
    # priorities in its log stay 0 for topics
    ctl_r2_topics = [r for r in ctl_log
                     if r["round"] == 2 and "/topic/" in r["url_norm"]]
    assert all(r["priority"] == 0 for r in ctl_r2_topics)
