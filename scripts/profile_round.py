#!/usr/bin/env python3
"""Per-round stage-wall breakdown of the synthetic crawl.

Runs the same job as ``bench.py --crawl-only`` at one parallelism level
and prints each round's stage_wall rows (per-table commit walls, bloom
build, seq assignment) plus the unattributed remainder of the round
wall — the term that does not shrink with cores is the scaling
bottleneck candidate.

Usage: python scripts/profile_round.py [--cores N] [--hosts H]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--hosts", type=int, default=96000)
    ap.add_argument("--filler", type=int, default=0)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--frontier-buckets", type=int, default=None)
    args = ap.parse_args()

    os.environ.setdefault("CRAWL_BENCH_HOSTS", str(args.hosts))
    os.environ.setdefault("CRAWL_BENCH_FILLER", str(args.filler))

    import bench
    from crawler_spark import engine, rules
    from crawler_spark.catalog import Catalog

    from crawler_spark.session import get_spark

    corpus = args.corpus or f"/tmp/crawl_scale_corpus_h{args.hosts}_f{args.filler}"
    spark = get_spark("profile_round", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, args.cores * 4, 1, args.cores).mapInPandas(
        lambda it: it, "id long").count()
    meta = bench.ensure_corpus(spark, corpus)
    tasks = rules.synthetic_tasks(
        max_depth=5, n_book_hosts=meta["n_hosts"], n_sun_hosts=meta["n_hosts"]
    )
    wh_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    wh = tempfile.mkdtemp(prefix="crawl_prof_wh_", dir=wh_base)
    try:
        kw = {}
        if args.frontier_buckets is not None:
            kw["frontier_buckets"] = args.frontier_buckets
        cfg = engine.CrawlConfig(
            tasks=tasks, pages_path=corpus, round_seconds=bench.ROUND_SECONDS,
            use_bloom=True, salt_buckets=4, collect_metrics=True, **kw,
        )
        cat = Catalog(wh)
        engine.run_crawl(spark, cat, cfg)
        mrows = cat.read(spark, "metrics").collect()
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    rounds = sorted({r.round for r in mrows})
    print(f"cores={args.cores} hosts={meta['n_hosts']} filler={meta['n_filler']}")
    for rnd in rounds:
        wall = next(r.value for r in mrows
                    if r.round == rnd and r.key == "wall_seconds")
        stages = sorted(
            ((r.key, r.value) for r in mrows
             if r.round == rnd and r.stage == "stage_wall"),
            key=lambda kv: -kv[1],
        )
        attributed = sum(v for _, v in stages)
        print(f"\nround {rnd}: wall={wall:.2f}s attributed={attributed:.2f}s "
              f"unattributed={wall - attributed:.2f}s")
        for k, v in stages:
            print(f"  {k:<22} {v:7.2f}s")


if __name__ == "__main__":
    main()
