#!/usr/bin/env python3
"""Per-Spark-stage decomposition of one synthetic crawl via the UI REST
API: for every stage, its wall (submission->completion), task count,
summed executor run/CPU time, and effective parallelism
(executorRunTime / wall).  Stages whose effective parallelism is far
below the core count are the scaling ceiling candidates the flat
8->32 line comes from (VERDICT r4 item #2)."""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 4049


def _ts(s: str) -> float:
    # "2026-08-19T19:00:00.123GMT"
    return datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--hosts", type=int, default=24000)
    ap.add_argument("--filler", type=int, default=200000)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    os.environ.setdefault("CRAWL_BENCH_HOSTS", str(args.hosts))
    os.environ.setdefault("CRAWL_BENCH_FILLER", str(args.filler))

    import bench
    from crawler_spark.session import get_spark

    corpus = args.corpus or f"/tmp/crawl_scale_corpus_h{args.hosts}_f{args.filler}"
    spark = get_spark(
        "stageprof", cores=args.cores, shuffle_partitions=args.cores,
        extra_conf={
            "spark.ui.enabled": "true", "spark.ui.port": str(PORT),
            "spark.ui.retainedStages": "3000",
            "spark.ui.retainedJobs": "3000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, args.cores * 4, 1, args.cores).mapInPandas(
        lambda it: it, "id long").count()
    bench.ensure_corpus(spark, corpus)

    base = f"http://localhost:{PORT}/api/v1/applications"
    aid = json.load(urllib.request.urlopen(base))[0]["id"]
    # mark: ignore stages before the crawl starts
    before = {s["stageId"] for s in json.load(
        urllib.request.urlopen(f"{base}/{aid}/stages"))}

    t0 = time.time()
    c = bench.bench_crawl(spark, corpus, args.cores)
    wall = time.time() - t0

    stages = json.load(urllib.request.urlopen(
        f"{base}/{aid}/stages?status=complete"))
    rows = []
    for s in stages:
        if s["stageId"] in before or "submissionTime" not in s:
            continue
        sw = _ts(s["completionTime"]) - _ts(s["submissionTime"])
        run = s["executorRunTime"] / 1000.0
        cpu = s.get("executorCpuTime", 0) / 1e9
        rows.append({
            "id": s["stageId"], "wall": sw, "tasks": s["numCompleteTasks"],
            "run": run, "cpu": cpu,
            "gc": s.get("jvmGcTime", 0) / 1000.0,
            "spill_mb": s.get("memoryBytesSpilled", 0) / 1e6,
            "par": (run / sw) if sw > 0 else 0.0,
            "input_mb": s.get("inputBytes", 0) / 1e6,
            "shuffle_r_mb": s.get("shuffleReadBytes", 0) / 1e6,
            "name": s["name"].split(" at ")[-1][:55] + "|" + s["name"].split(" at ")[0][:28],
        })
    rows.sort(key=lambda r: -r["wall"])
    tot_wall = sum(r["wall"] for r in rows)
    tot_run = sum(r["run"] for r in rows)
    tot_cpu = sum(r["cpu"] for r in rows)
    print(f"cores={args.cores} crawl_wall={wall:.1f}s "
          f"steady={c['steady_urls_per_sec']:.0f} urls/s")
    print(f"sum stage walls={tot_wall:.1f}s (stages can overlap) "
          f"sum executorRun={tot_run:.1f}s sum executorCpu={tot_cpu:.1f}s")
    tot_gc = sum(r["gc"] for r in rows)
    print(f"sum jvmGcTime={tot_gc:.1f}s")
    print(f"{'wall':>7} {'tasks':>5} {'run':>8} {'cpu':>8} {'gc':>7} {'par':>6} "
          f"{'in_mb':>8} {'shr_mb':>7} {'spl_mb':>7}  name")
    for r in rows[: args.top]:
        print(f"{r['wall']:7.2f} {r['tasks']:5d} {r['run']:8.2f} "
              f"{r['cpu']:8.2f} {r['gc']:7.2f} {r['par']:6.1f} {r['input_mb']:8.1f} "
              f"{r['shuffle_r_mb']:7.1f} {r['spill_mb']:7.1f}  {r['name']}")
    # parallelism histogram: stage wall attributed by effective par
    buckets = [(0, 2), (2, 8), (8, 16), (16, 33), (33, 10**9)]
    print("\nstage-wall by effective parallelism:")
    for lo, hi in buckets:
        w = sum(r["wall"] for r in rows if lo <= r["par"] < hi)
        print(f"  par [{lo:>2},{hi if hi < 10**9 else 'inf'}): "
              f"{w:7.1f}s ({100 * w / tot_wall:.0f}%)")
    spark.stop()


if __name__ == "__main__":
    main()
