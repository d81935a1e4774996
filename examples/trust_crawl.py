#!/usr/bin/env python3
"""Trust-prioritized crawling — the link-analysis kernels composing
with the frontier engine, the way a production crawler actually uses
them: the task's OWN seed hosts are the vetted set, TrustRank
propagates their trust over the link graph mined from already-fetched
pages, and a pre-round hook lifts each pending URL's priority to its
host's trust score — so the politeness budget is spent on
well-endorsed hosts first and link-farm neighbourhoods (unreachable
from the seeds) sink to the rule-constant floor.  Companion to
examples/focused_crawl.py (topical anchors) — same hook seam, same
engine semantics untouched (politeness, dedup, retry, depth, resume).

    spark-submit --py-files dist/crawler_spark.zip \
        examples/trust_crawl.py --pages /data/pages.parquet \
        --warehouse /tmp/wh

Scale shape: the host graph is host-cardinality, not URL-cardinality —
one scan explodes hrefs, hosts hash to long node ids scan-side
(xxhash64), edges distinct on (src, dst).  trustrank_micro is one
join + one map-side-combined sum per iteration with the seed flag
broadcast.  The priority lift joins pending rows to the HOST-sized
trust table (broadcastable).  At 10^10 URLs the graph would be mined
from the round's parse delta and accumulated in a catalog table —
the engine's existing dirty-bucket discipline; the full-corpus scan
here keeps the example self-contained.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark import urlnorm  # noqa: E402
from crawler_spark.functions import graph  # noqa: E402
from crawler_spark.functions.anchors import ANCHOR_RE  # noqa: E402


def host_trust(spark, pages, seed_hosts, iterations: int = 3):
    """(host_hash, trust_micro, is_seed) over the mined host graph."""
    tgt = F.explode(
        F.regexp_extract_all(F.col("html"), F.lit(ANCHOR_RE), F.lit(1))
    )
    edges = (
        pages.select(
            urlnorm.host_col(F.col("url")).alias("src_h"),
            tgt.alias("target"),
        )
        .select("src_h", urlnorm.host_col(F.col("target")).alias("dst_h"))
        .where(
            (F.col("src_h") != "")  # relative/invalid links extract ""
            & (F.col("dst_h") != "")
            & (F.col("src_h") != F.col("dst_h"))
        )
        .select(
            F.xxhash64("src_h").alias("src"), F.xxhash64("dst_h").alias("dst")
        )
    )
    seeds = spark.createDataFrame(
        [(h,) for h in seed_hosts], "host string"
    ).select(F.xxhash64("host").alias("node"))
    return graph.trustrank_micro(edges, seeds, iterations=iterations)


def make_trust_hook(pages_path: str, seed_hosts: tuple[str, ...],
                    iterations: int = 3, frontier_buckets: int = 32):
    """Pre-round hook: lift pending priorities to the target host's
    TrustRank score.  Promote-only (greatest), like the focus hook —
    rows on unranked hosts keep their rule-constant priority."""

    def hook(spark, cat, state):
        pend = cat.read(spark, "frontier_pending")
        pages = spark.read.parquet(pages_path).selectExpr(
            "url", "cast(html as string) as html"
        )
        trust = host_trust(spark, pages, seed_hosts, iterations).select(
            F.col("node").alias("__h"), "trust_micro"
        )
        ptype = pend.schema["priority"].dataType
        resc = (
            pend.withColumn("__h", F.xxhash64("host"))  # frontier carries host
            .join(F.broadcast(trust), "__h", "left")
            .withColumn(
                "priority",
                F.greatest(
                    F.col("priority").cast("long"),
                    F.coalesce(F.col("trust_micro"), F.lit(0)),
                ).cast(ptype),
            )
            .select(*pend.columns)
        )
        n_buckets = cat.bucket_count("frontier_pending") or frontier_buckets
        cat.commit_buckets(resc, "frontier_pending", "url_hash", n_buckets)

    return hook


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--round-seconds", type=int, default=8)
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--iterations", type=int, default=3)
    args = ap.parse_args()

    from crawler_spark import engine, rules
    from crawler_spark.catalog import Catalog
    from crawler_spark.session import get_spark

    spark = get_spark()
    tasks = rules.synthetic_tasks(
        n_book_hosts=args.hosts, n_sun_hosts=args.hosts
    )
    seed_hosts = tuple(
        sorted({urlnorm.host_py(u) for t in tasks.values() for (u, _r, _p) in t.seeds})
    )
    cfg = engine.CrawlConfig(
        tasks=tasks,
        pages_path=args.pages,
        round_seconds=args.round_seconds,
        use_bloom=True,
        max_rounds=args.rounds,
    )
    cat = Catalog(args.warehouse)
    hook = make_trust_hook(args.pages, seed_hosts, args.iterations)
    state = engine.run_crawl(spark, cat, cfg, round_hook=hook)
    log = cat.read(spark, "schedule_log")
    log.groupBy("round").agg(
        F.count(F.lit(1)).alias("scheduled"),
        F.sum((F.col("priority") > 0).cast("long")).alias("trusted"),
    ).orderBy("round").show()
    print({"rounds": state["round"], "seen": state["seen_count"]})


if __name__ == "__main__":
    main()
