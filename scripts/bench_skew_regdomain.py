#!/usr/bin/env python3
"""Mega-domain hot-key rank microbenchmark (VERDICT r4 #9): the
politeness budget keyed by REGISTRABLE domain turns thousands of
subdomains into one giant window key — the exact skew the salted
two-phase rank exists for.  Measures salt 1 vs 16 on identical input
(outputs asserted equal) and appends BENCH/SKEW.md.

Usage: python scripts/bench_skew_regdomain.py [--rows N] [--reps R]
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
    ap.add_argument("--subdomains", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from crawler_spark import rules
    from crawler_spark.politeness import rank_by_budget
    from crawler_spark.session import get_spark

    spark = get_spark("bench_skew_rd", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()

    hot_pct = int(args.hot_frac * 10)
    frontier = spark.range(args.rows).select(
        F.col("id").alias("seq"),
        F.format_string("https://x/p/%d", F.col("id")).alias("url_norm"),
        F.xxhash64(F.col("id")).alias("url_hash"),
        F.when(
            F.col("id") % 10 < hot_pct,
            F.format_string("shard%d.cdn.mega.co.uk",
                            F.col("id") % args.subdomains),
        ).otherwise(F.format_string("cold%d.test", F.col("id") % 4999))
        .alias("host"),
        F.lit("t").alias("task_name"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.lit(None).cast("int").alias("robots_budget"),
    ).persist()
    frontier.count()
    tasks = {"t": rules.Task(name="t", rules={}, seeds=(),
                             rate_limits=((30_000, 30),))}

    results = {}
    for salt in (1, 16):
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            s, _d = rank_by_budget(
                frontier, tasks, round_seconds=30.0, salt_buckets=salt,
                politeness_key="registered_domain",
            )
            s.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 2))
        results[salt] = walls
        print(f"salt={salt} walls={walls}", flush=True)

    # equality witness (cheap count-based; the exact-set property is
    # pinned in tests/test_politeness_regdomain_skew.py)
    s1, _ = rank_by_budget(frontier, tasks, 30.0, salt_buckets=1,
                           politeness_key="registered_domain")
    s16, _ = rank_by_budget(frontier, tasks, 30.0, salt_buckets=16,
                            politeness_key="registered_domain")
    c1, c16 = s1.count(), s16.count()
    assert c1 == c16, (c1, c16)
    best1, best16 = min(results[1]), min(results[16])
    md = f"""

## Mega-domain hot key under `politeness_key=registered_domain` (r5)

Frontier: {args.rows:,} rows, {int(args.hot_frac * 100)}% on {args.subdomains}
subdomains of ONE registrable domain (mega.co.uk), budget 30,000/domain/round,
local[{args.cores}].  The per-domain key collapses all {args.subdomains}
subdomains into one window key ({int(args.rows * args.hot_frac):,} rows) —
the worst-case skew the salted two-phase rank targets.  Scheduled sets
identical at both salt levels (asserted here by count = {c1:,}; exact-set
property in tests/test_politeness_regdomain_skew.py).

| salt_buckets | best wall (s) | all reps (s) |
|---|---|---|
| 1 (single window) | {best1} | {results[1]} |
| 16 (two-phase) | {best16} | {results[16]} |

**speedup: {best1 / best16:.2f}x**
"""
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "a") as f:
        f.write(md)
    print(md)
    spark.stop()


if __name__ == "__main__":
    main()
