#!/usr/bin/env python3
"""Crawl-state monitoring — the sketch family composing with the
engine's catalog tables, the way a production frontier dashboard
works: distinct-URL growth from per-round HyperLogLog register deltas
(merged, never rescanning history), heavy pending hosts from a
Count-Min pass over the frontier, and a bloom saturation forecast of
how many pending URLs the seen-set pre-filter will send to the exact
anti-join.  Companion to examples/trust_crawl.py / focused_crawl.py —
read-only over the same catalog any crawl leaves behind.

    spark-submit --py-files dist/crawler_spark.zip \
        examples/monitor_crawl.py --warehouse /tmp/wh

Scale shape — the whole point of sketching the monitor:

- **distinct URLs**: hll_registers keyed by round is <= 64 rows per
  round however many URLs that round saw; the all-time estimate is a
  register-wise MAX over those rows (the mergeability law the
  hll_merge contract row hash-pins), so the monitor NEVER rescans the
  full seen table — at 10^10 URLs the alternative (countDistinct per
  dashboard refresh) is a full shuffle of the biggest table in the
  system.  (The exact count shown next to it here is the small-scale
  verification column, not part of the production path.)
- **heavy hosts**: the Count-Min build shuffles 256 counters however
  large the frontier; estimates are one-sided (never under-count), so
  a host flagged heavy IS heavy — the right direction for a
  politeness alarm.
- **bloom forecast**: bloom_fpr_stats over (seen members, pending
  probes) prices the next round's filter work: probes that hit the
  filter pay the exact anti-join, misses skip it (SURVEY §7 hard
  part 2 — FPs cost a probe, never a dropped URL).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark import seen as seenmod  # noqa: E402
from crawler_spark.catalog import Catalog  # noqa: E402
from crawler_spark.functions import sketches  # noqa: E402


def distinct_url_report(spark, cat: Catalog):
    """(scope, hll_est, n_exact): one row per crawl round plus the
    'all' row whose estimate comes ONLY from merging the per-round
    registers — proven equal to sketching the whole table directly
    (hll_merge contract row); n_exact is the small-scale check."""
    seen = cat.read(spark, "seen").select("round", "url_norm")
    per_round = sketches.hll_registers(seen, ["round"], "url_norm")
    round_est = sketches.hll_estimate(per_round, ["round"]).select(
        F.col("round").cast("string").alias("scope"), "hll_est"
    )
    merged = sketches.hll_estimate(
        per_round.groupBy("reg").agg(F.max("m").alias("m")).select(
            F.lit("all").alias("scope"), "reg", "m"
        ),
        ["scope"],
    )
    exact = seen.groupBy(
        F.col("round").cast("string").alias("scope")
    ).agg(F.countDistinct("url_norm").alias("n_exact"))
    exact_all = seen.agg(
        F.lit("all").alias("scope"),
        F.countDistinct("url_norm").alias("n_exact"),
    )
    return (
        round_est.unionByName(merged)
        .join(exact.unionByName(exact_all), "scope")
        .orderBy("scope")
    )


def heavy_pending_hosts(spark, cat: Catalog, k: int = 5):
    """(host, exact_cnt, cm_est): Count-Min estimates for the exact
    top-k pending hosts — cm_est >= exact_cnt always (one-sided)."""
    from pyspark.sql import Window as W

    pending = cat.read(spark, "frontier_pending").select("host")
    sk = sketches.count_min_sketch(pending, "host")
    exact = pending.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )
    probes = (
        exact.withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.desc("exact_cnt"), F.asc("host"))),
        )
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    return sketches.count_min_estimate(sk, probes, "host")


def bloom_forecast(spark, cat: Catalog):
    """One row: the seen-set bloom twin probed with the pending URLs
    that are genuinely unseen — n_false_pos prices the exact-join
    work the pre-filter cannot skip next round."""
    seen = cat.read(spark, "seen").select(
        F.col("url_norm").alias("key")
    ).distinct()
    pending = (
        cat.read(spark, "frontier_pending")
        .select(F.col("url_norm").alias("key"))
        .distinct()
        .join(seen, "key", "left_anti")
    )
    return seenmod.bloom_fpr_stats(seen, pending, "key")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from crawler_spark.session import get_spark

    spark = get_spark(cores=args.cores)
    cat = Catalog(args.warehouse)
    print("== distinct URLs per round (+ merged all-time) ==")
    distinct_url_report(spark, cat).show(100, truncate=False)
    print("== heavy pending hosts (Count-Min vs exact) ==")
    heavy_pending_hosts(spark, cat).show(truncate=False)
    print("== bloom pre-filter forecast ==")
    bloom_forecast(spark, cat).show(truncate=False)


if __name__ == "__main__":
    main()
