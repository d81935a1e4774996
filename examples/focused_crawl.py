#!/usr/bin/env python3
"""Focused (topical) crawling on top of the frontier engine — the
composition the reference cannot express: its priority is a static
per-rule constant (schedule.go), so within a rule every link is equal.
Here a pre-round hook rescores `frontier_pending` from anchor-text
topical relevance (functions/anchors.focused_priority), and the
engine's existing politeness-budgeted rank spends each host's budget
on the on-topic links first.

    spark-submit --py-files dist/crawler_spark.zip \
        examples/focused_crawl.py --pages /data/pages.parquet \
        --warehouse /tmp/wh --keywords quantum,qubit

The hook is ordinary catalog I/O: read the pending frontier, score
every (anchor -> target) pair in the fetched corpus, take
focus_micro = floor(1e6 * on-topic-inlinks / inlinks) (+ a capped URL
bonus), lift each pending row's priority to its score, and commit the
frontier back.  Politeness, dedup, retry, depth, and resume semantics
are untouched — the hook only reorders WITHIN each host's budget.

Scale shape: anchor scoring is one scan + one map-side-combined
groupBy(target); the priority lift is one join keyed on url; the
frontier recommit is the same bucketed write the engine itself uses.
At 10^10 URLs the hook would score only the round's newly parsed pages
(delta, not the whole corpus) and commit only dirty buckets — both are
the engine's existing disciplines; the full-corpus rescan here keeps
the example self-contained.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.functions import anchors  # noqa: E402


def make_focus_hook(pages_path: str, keywords: tuple[str, ...],
                    frontier_buckets: int = 32):
    """Pre-round hook: lift pending priorities to anchor-text focus
    scores.  Rows whose inbound anchors never mention the lexicon keep
    their original priority — the hook promotes, never demotes, so
    reference-semantics rows (rule-constant priority) still schedule."""

    def hook(spark, cat, state):
        pend = cat.read(spark, "frontier_pending")
        pages = spark.read.parquet(pages_path).selectExpr(
            "cast(html as string) as html"
        )
        scores = anchors.focused_priority(
            anchors.anchor_pairs(pages), keywords
        ).select(F.col("target").alias("url"), "focus_micro")
        ptype = pend.schema["priority"].dataType
        resc = (
            pend.join(scores, "url", "left")
            .withColumn(
                "priority",
                F.greatest(
                    F.col("priority").cast("long"),
                    F.coalesce(F.col("focus_micro"), F.lit(0)),
                ).cast(ptype),
            )
            .drop("focus_micro")
            .select(*pend.columns)
        )
        n_buckets = cat.bucket_count("frontier_pending") or frontier_buckets
        cat.commit_buckets(resc, "frontier_pending", "url_hash", n_buckets)

    return hook


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--keywords", required=True,
                    help="comma-separated focus lexicon")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--round-seconds", type=int, default=8)
    ap.add_argument("--hosts", type=int, default=8)
    args = ap.parse_args()

    from crawler_spark import engine, rules
    from crawler_spark.catalog import Catalog
    from crawler_spark.session import get_spark

    spark = get_spark()
    cfg = engine.CrawlConfig(
        tasks=rules.synthetic_tasks(
            n_book_hosts=args.hosts, n_sun_hosts=args.hosts
        ),
        pages_path=args.pages,
        round_seconds=args.round_seconds,
        use_bloom=True,
        max_rounds=args.rounds,
    )
    cat = Catalog(args.warehouse)
    hook = make_focus_hook(
        args.pages, tuple(k for k in args.keywords.split(",") if k)
    )
    state = engine.run_crawl(spark, cat, cfg, round_hook=hook)
    log = cat.read(spark, "schedule_log")
    log.groupBy("round").agg(
        F.count(F.lit(1)).alias("scheduled"),
        F.sum((F.col("priority") > 0).cast("long")).alias("on_topic"),
    ).orderBy("round").show()
    print({"rounds": state["round"], "seen": state["seen_count"]})


if __name__ == "__main__":
    main()
