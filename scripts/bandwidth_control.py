#!/usr/bin/env python3
"""Same-VM scaling controls (VERDICT r4 item #2): two jobs run at each
parallelism level on identical input.

- compute: arithmetic-dense, cache-resident — 200M xxhash64 chain
  iterations over a generated long column.  Touches ~no RAM beyond the
  working set; if the box can scale CPU, this scales.
- scan: bandwidth-dense — full corpus parquet scan + UTF-8 decode +
  aggregate over the html payloads, the same byte traffic a crawl
  round's fetch/parse stage pays, with trivial arithmetic.

If compute scales ~linearly while scan goes flat at the same core
counts where the crawl goes flat, the crawl's ceiling is memory
bandwidth, not a serial term in the engine.  Prints one JSON line per
(job, cores) with wall + whole-box CPU-seconds (stall cycles accrue CPU
time, so bandwidth starvation shows as CPU inflation at flat wall).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(job: str, cores: int, corpus: str) -> None:
    from pyspark.sql import functions as F

    from crawler_spark.session import get_spark

    spark = get_spark(f"ctrl_{job}", cores=cores, shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()

    def jiffies() -> int:
        with open("/proc/stat") as f:
            p = f.readline().split()
        return sum(int(x) for x in p[1:4]) + sum(int(x) for x in p[6:9])

    hz = os.sysconf("SC_CLK_TCK")
    # NB: Spark 4.1 serves a REPEATED identical collect from a result
    # cache (measured: 9s -> 0.04s), so each rep embeds a distinct
    # literal to force real re-execution.
    def make_plan(rep: int):
        if job == "compute":
            n, chain = 40_000_000, 40
            df = spark.range(0, n, 1, cores * 4)
            col = F.col("id") + F.lit(rep)
            for _ in range(chain):
                col = F.xxhash64(col)
            return df.select(col.alias("h")).selectExpr("sum(h % 1000000)")
        if job == "scan":
            return (
                spark.read.parquet(corpus)
                .select(
                    (F.length(F.decode(F.col("html"), "UTF-8")) + F.lit(rep))
                    .alias("n")
                )
                .selectExpr("sum(n)")
            )
        raise SystemExit(f"unknown job {job}")

    make_plan(99).collect()  # warm (JIT, page cache)
    reps = 3
    t0, j0 = time.time(), jiffies()
    for rep in range(reps):
        make_plan(rep).collect()
    wall = (time.time() - t0) / reps
    cpu = (jiffies() - j0) / hz / reps
    print(json.dumps({
        "job": job, "cores": cores, "wall": round(wall, 3),
        "cpu_sec": round(cpu, 2), "cpu_per_wall": round(cpu / wall, 2),
    }), flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/crawl_scale_corpus_h24000_f200000")
    ap.add_argument("--levels", default="2,8,32")
    ap.add_argument("--job", default=None, help="internal: run one job inline")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if args.job:
        run_one(args.job, args.cores, args.corpus)
        return
    for job in ("compute", "scan"):
        for cores in [int(x) for x in args.levels.split(",")]:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--job", job,
                 "--cores", str(cores), "--corpus", args.corpus],
                check=True,
            )


if __name__ == "__main__":
    main()
