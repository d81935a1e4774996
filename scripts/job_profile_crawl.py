#!/usr/bin/env python3
"""Per-ACTION decomposition of one synthetic crawl via the jobs REST
API: engine.run_round labels every driver action with a job
description; this groups job walls by that label at one parallelism
level and reports the inter-job driver gap — the serial term.
(VERDICT r4 item #2: decompose the flat 8->32 line.)"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
import urllib.request
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PORT = 4048


def _ts(s: str) -> float:
    return datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--hosts", type=int, default=24000)
    ap.add_argument("--filler", type=int, default=200000)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()
    os.environ.setdefault("CRAWL_BENCH_HOSTS", str(args.hosts))
    os.environ.setdefault("CRAWL_BENCH_FILLER", str(args.filler))

    import bench
    from crawler_spark.session import get_spark

    corpus = args.corpus or f"/tmp/crawl_scale_corpus_h{args.hosts}_f{args.filler}"
    spark = get_spark(
        "jobprof", cores=args.cores, shuffle_partitions=args.cores,
        extra_conf={
            "spark.ui.enabled": "true", "spark.ui.port": str(PORT),
            "spark.ui.retainedJobs": "5000",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, args.cores * 4, 1, args.cores).mapInPandas(
        lambda it: it, "id long").count()
    bench.ensure_corpus(spark, corpus)

    base = f"http://localhost:{PORT}/api/v1/applications"
    aid = json.load(urllib.request.urlopen(base))[0]["id"]
    before = {j["jobId"] for j in json.load(
        urllib.request.urlopen(f"{base}/{aid}/jobs"))}

    t0 = time.time()
    c = bench.bench_crawl(spark, corpus, args.cores)
    wall = time.time() - t0

    jobs = [j for j in json.load(urllib.request.urlopen(f"{base}/{aid}/jobs"))
            if j["jobId"] not in before and "completionTime" in j]
    jobs.sort(key=lambda j: j["jobId"])
    spans = []
    groups: dict[str, float] = {}
    for j in jobs:
        s, e = _ts(j["submissionTime"]), _ts(j["completionTime"])
        desc = j.get("description", "") or j["name"]
        # strip round numbers so rounds aggregate
        label = re.sub(r"\br\d+\b", "rN", desc.split(" at ")[0])[:60]
        groups[label] = groups.get(label, 0.0) + (e - s)
        spans.append((s, e))
    # union of job spans vs crawl wall -> driver-only gap
    spans.sort()
    covered, cur_s, cur_e = 0.0, None, None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    print(f"cores={args.cores} crawl_wall={wall:.1f}s "
          f"steady={c['steady_urls_per_sec']:.0f} urls/s "
          f"job-covered={covered:.1f}s driver-gap={wall - covered:.1f}s "
          f"({100 * (wall - covered) / wall:.0f}%)")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {v:7.2f}s  {k}")
    spark.stop()


if __name__ == "__main__":
    main()
