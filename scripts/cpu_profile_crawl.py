#!/usr/bin/env python3
"""Whole-box CPU accounting for one synthetic crawl: samples /proc/stat
while the crawl runs and reports CPU-seconds (user+sys) per round-wall
second.  If CPU-sec/wall-sec ~= 8 at BOTH local[8] and local[32], the
flat 8->32 throughput line is a parallelism ceiling (the job never uses
the extra cores); if it rises to ~32 with a flat wall, the extra cores
are busy but unproductive (bandwidth/lock-bound)."""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_jiffies() -> float:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    return sum(int(x) for x in parts[1:4]) + sum(int(x) for x in parts[6:9])


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
    spark = get_spark("cpuprof", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()
    spark.range(0, args.cores * 4, 1, args.cores).mapInPandas(
        lambda it: it, "id long").count()
    bench.ensure_corpus(spark, corpus)

    hz = os.sysconf("SC_CLK_TCK")
    samples: list[tuple[float, float]] = []
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            samples.append((time.time(), read_jiffies()))
            time.sleep(0.5)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.time()
    c = bench.bench_crawl(spark, corpus, args.cores)
    wall = time.time() - t0
    stop.set()
    th.join()
    cpu_sec = (samples[-1][1] - samples[0][1]) / hz
    print(json.dumps({
        "cores": args.cores,
        "wall": round(wall, 2),
        "cpu_sec": round(cpu_sec, 2),
        "cpu_per_wall": round(cpu_sec / wall, 2),
        "steady_urls_per_sec": c["steady_urls_per_sec"],
        "round_walls": c["round_walls"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
