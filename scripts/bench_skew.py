#!/usr/bin/env python3
"""Hot-host skew microbenchmark: the two-phase salted politeness rank
vs the single-window exact rank on a frontier where most rows live on
ONE host (the worst case the north_rule's salting targets).

A single `Window.partitionBy(host)` serializes the hot host's rows
through one task; phase 1 ranks within (host, salt) — parallel across
salts — and phase 2 re-ranks only the <= salt_buckets x budget
survivors.  This script measures both shapes on identical input and
writes BENCH/SKEW.md.  Results are equal by construction (asserted, and
property-tested in tests/test_politeness_salting.py).

Usage: python scripts/bench_skew.py [--rows N] [--hot-frac F] [--reps R]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from crawler_spark import rules
    from crawler_spark.politeness import rank_by_budget
    from crawler_spark.session import get_spark

    spark = get_spark("bench_skew", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()

    hot_pct = int(args.hot_frac * 10)
    frontier = spark.range(args.rows).select(
        F.col("id").alias("seq"),
        F.format_string("https://x/p/%d", F.col("id")).alias("url_norm"),
        F.xxhash64(F.col("id")).alias("url_hash"),
        F.when(F.col("id") % 10 < hot_pct, "hot.test")
        .otherwise(F.format_string("cold%d.test", F.col("id") % 4999)).alias("host"),
        F.lit("t").alias("task_name"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.lit(None).cast("int").alias("robots_budget"),
    ).persist()
    n = frontier.count()  # materialize once; both shapes read the cache

    tasks = {"t": rules.Task(name="t", rules={}, seeds=(), rate_limits=((1000, 1),))}
    # budget = 30000/host/round: large enough that phase-2 survivor sets
    # are non-trivial, tiny vs the hot host's 3.2M rows

    results: dict[int, list[float]] = {}
    counts: dict[int, int] = {}
    for salt in (1, 16):
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            sched, _def = rank_by_budget(frontier, tasks, round_seconds=30.0,
                                         salt_buckets=salt)
            c = sched.count()
            walls.append(time.time() - t0)
            counts[salt] = c
        results[salt] = walls
    assert counts[1] == counts[16], counts  # identical admission

    best1, best16 = min(results[1]), min(results[16])
    md = [
        "# BENCH/SKEW — hot-host two-phase rank microbenchmark",
        "",
        f"Frontier: {n:,} rows, {args.hot_frac:.0%} on ONE host, "
        f"budget 30,000/host/round, local[{args.cores}].",
        "Scheduled sets identical at both salt levels (asserted; "
        "property test in tests/test_politeness_salting.py).",
        "",
        "| salt_buckets | best wall (s) | all reps (s) |",
        "|---|---|---|",
        f"| 1 (single window) | {best1:.2f} | {[round(w,2) for w in results[1]]} |",
        f"| 16 (two-phase) | {best16:.2f} | {[round(w,2) for w in results[16]]} |",
        "",
        f"**speedup: {best1 / best16:.2f}x** — phase 1 spreads the hot "
        "host across 16 parallel salt partitions; phase 2 re-ranks only "
        "the bounded survivor set.  At 10^7-row hot hosts on a real "
        "cluster the single-window shape is a straggler that pins one "
        "task for the whole stage; the two-phase shape stays balanced.",
        "",
    ]
    out = os.path.join(REPO, "BENCH", "SKEW.md")
    with open(out, "w") as f:
        f.write("\n".join(md))
    print(f"{out}: salt1 best {best1:.2f}s, salt16 best {best16:.2f}s, "
          f"speedup {best1 / best16:.2f}x, scheduled {counts[1]}")
    spark.stop()


if __name__ == "__main__":
    main()
