#!/usr/bin/env python3
"""Bisect which part of the fetch-join+parse stage stops scaling:
(a) corpus scan+decode, (b) +broadcast join, (c) +parse CASE dispatch,
(d) +parquet write.  Run at two core counts; compare walls."""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", default="/tmp/crawl_scale_corpus_h24000_f200000")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark import engine, rules
    from crawler_spark.parsers import dispatch_cols
    from crawler_spark.session import get_spark

    spark = get_spark("bisect", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(0, 1_000_000).selectExpr("sum(id)").collect()

    pages = engine.prepare_pages(spark.read.parquet(args.corpus))
    # scheduled-like build side: every ~7th url + task/rule columns
    sched = (
        spark.read.parquet(args.corpus)
        .select("url")
        .where(F.pmod(F.xxhash64("url"), F.lit(7)) == 0)
        .select(
            F.col("url"),
            F.regexp_replace("url", r"^https?://", "").alias("url_norm"),
            F.when(F.xxhash64("url") % 2 == 0, F.lit("book_list"))
            .otherwise(F.lit("sun_room")).alias("task_name"),
            F.when(F.xxhash64("url") % 2 == 0, F.lit("book_detail"))
            .otherwise(F.lit("group_list")).alias("rule_name"),
            F.lit(1).alias("depth"), F.lit(0).alias("priority"),
            F.xxhash64("url").alias("seq"),
            F.create_map().cast("map<string,string>").alias("tmp"),
        )
    ).persist()
    n = sched.count()
    tasks = rules.synthetic_tasks(max_depth=5, n_book_hosts=100, n_sun_hosts=100)

    def run(label, df, write=False, rep_salt=0):
        t0 = time.time()
        if write:
            out = tempfile.mkdtemp(prefix="bisect_", dir="/dev/shm")
            df.write.mode("overwrite").parquet(out)
            import shutil
            shutil.rmtree(out, ignore_errors=True)
        else:
            df.write.format("noop").mode("overwrite").save()
        print(json.dumps({"cores": args.cores, "step": label,
                          "wall": round(time.time() - t0, 3), "n_sched": n}),
              flush=True)

    pp = pages
    # (a) scan + decode + length
    a = pp.select(F.length(F.decode(F.col("html"), "UTF-8")).alias("x"))
    # (b) + broadcast join
    joined = pp.join(F.broadcast(sched.select("url_norm", "url", "task_name",
                                              "rule_name", "tmp")), "url_norm")
    b = joined.select(F.length(F.decode(F.col("html"), "UTF-8")).alias("x"))
    # (c) + parse dispatch
    hits = joined.withColumn("body", F.decode(F.col("html"), "UTF-8"))
    c = hits.select(
        "url_norm",
        *[col.alias(name) for name, col in
          dispatch_cols(tasks, body_col="body").items()],
    )
    # (d) c + parquet write
    for rep in range(2):
        run("a_scan_decode", a)
        run("b_plus_join", b)
        run("c_plus_parse", c)
        run("d_parse_write", c, write=True)
    spark.stop()


if __name__ == "__main__":
    main()
