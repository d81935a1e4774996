"""mirror_hosts subquadratic-scale evidence.

The pair generator is an inverted-index self-join keyed by content
fingerprint, so the dangerous input is a fingerprint shared by MANY
hosts (a parked-domain lander): its posting list alone contributes
O(H^2) candidate pairs.  ``max_hosts_per_fp`` caps that list — this
script measures the candidate-pair join size with the cap ON vs OFF
while the host count grows ``--factor``x, holding pages-per-host
constant:

* true mirror pairs (structural) grow LINEARLY with hosts (each new
  host block brings the same 10 mirror pairs);
* the universal lander's uncapped candidates grow QUADRATICALLY;
* with the cap ON, candidate growth must track the linear mirror
  structure — that is the 100-TB admission ticket.

    python scripts/bench_mirror_scale.py [--factor 4] [--hosts 40]
        [--pages 20] [--cores 8]

Writes one JSON line per (scale, mode) to stdout; paste the table
into BENCH/ROUNDS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.functions import hoststats  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402


def corpus(spark, n_hosts: int, pages: int):
    """n_hosts hosts x pages pages.  Within each 20-host block, hosts
    h and h+10 mirror ~75% of their pages; every host serves ONE
    universal parked-lander page (the quadratic threat)."""
    df = spark.range(n_hosts * pages).select(
        (F.col("id") % n_hosts).alias("h"),
        (F.col("id") / n_hosts).cast("long").alias("slot"),
    )
    block = (F.col("h") % 20)
    mirrored = block.between(10, 19) & (F.col("slot") % 4 != 0)
    content_h = F.when(mirrored, F.col("h") - 10).otherwise(F.col("h"))
    text = F.when(F.col("slot") == 0, F.lit("parked domain lander")).otherwise(
        F.format_string("page %d of %d", F.col("slot"), content_h)
    )
    return df.select(
        F.format_string("host%06d", F.col("h")).alias("host"),
        text.alias("text"),
    )


def candidate_pairs(df, cap):
    """The pair-join input size mirror_hosts materializes: rows of the
    fp-keyed self-join before pair aggregation."""
    hf = df.select(
        "host",
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
        .alias("fp"),
    ).distinct()
    if cap is not None:
        keep = hf.groupBy("fp").count().where(F.col("count") <= cap)
        hf = hf.join(keep.select("fp"), "fp")
    a, b = hf.alias("a"), hf.alias("b")
    return (
        a.join(b, "fp").where(F.col("a.host") < F.col("b.host")).count()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--hosts", type=int, default=40)
    ap.add_argument("--pages", type=int, default=20)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--cap", type=int, default=1000)
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    for scale in (1, args.factor):
        n_hosts = args.hosts * scale
        df = corpus(spark, n_hosts, args.pages).cache()
        df.count()
        for mode, cap in (("capped", min(args.cap, n_hosts - 1)),
                          ("uncapped", None)):
            t0 = time.time()
            cand = candidate_pairs(df, cap)
            t1 = time.time()
            out = hoststats.mirror_hosts(
                df, max_hosts_per_fp=cap
            ).count()
            print(json.dumps({
                "scale": scale, "hosts": n_hosts, "mode": mode,
                "candidate_rows": cand, "mirror_pairs": out,
                "cand_wall_sec": round(t1 - t0, 2),
            }), flush=True)
        df.unpersist()


if __name__ == "__main__":
    main()
