"""Incremental-probe scale evidence: probe cost tracks the BATCH, not
the corpus.

The claim behind dedup_incremental / minhash_probe_prebuilt: per-
snapshot dedup against an already-indexed corpus pays signature work
O(batch) — the corpus's band index is built once (that cost is the
amortized column) and a probe re-shingles corpus text only for
candidate-matched docs.  This script measures it directly: a FIXED
1000-doc incoming batch (exact copies of replica-0 docs, so the match
set is identical at every scale) probes the stored index of a corpus
grown 1x -> 10x (replica token rotation as in bench_dedup_scale.py, so
extra replicas contribute zero matches and zero shared shingles).

Expected shape: index-build wall grows ~linearly with the corpus (paid
once per corpus, not per batch); probe wall stays near-flat (batch
signatures dominate; the index-side cost is a columnar scan of band
rows — at deployment scale, partition pruning on the bsig_hash buckets
— never corpus signature work, never corpus text).

    python scripts/bench_probe_scale.py [--factor 10] [--cores 32]

Writes one JSON line per scale to stdout; paste into BENCH/ROUNDS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.catalog import Catalog  # noqa: E402
from crawler_spark.functions import dedup  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_corpus(spark, factor: int):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n = base.count()
    alpha = string.ascii_lowercase
    parts = []
    for r in range(factor):
        rot = alpha[r:] + alpha[:r]
        parts.append(
            base.select(
                (F.col("doc_id") + r * n).alias("doc_id"),
                F.translate(F.col("text"), alpha, rot).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, n * factor


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    batch = (
        base.orderBy("doc_id").limit(args.batch)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .persist()
    )
    batch.count()

    for factor in (1, args.factor):
        corpus, n_docs = replicated_corpus(spark, factor)
        corpus = corpus.persist()
        corpus.count()

        wh = f"/tmp/probe_scale_wh_{factor}"
        shutil.rmtree(wh, ignore_errors=True)
        cat = Catalog(wh)

        t0 = time.time()
        rows = dedup.minhash_build_index(corpus, "doc_id")
        _, n_index_rows = cat.commit_buckets(rows, "mh_index", "bsig_hash", 32)
        build_s = time.time() - t0

        stored = cat.read(spark, "mh_index").drop("_bucket")
        t0 = time.time()
        matches = dedup.minhash_probe_prebuilt(
            stored, batch, corpus, "doc_id"
        ).count()
        probe_s = time.time() - t0

        print(json.dumps({
            "scale": factor, "n_indexed_docs": n_docs,
            "n_index_rows": n_index_rows, "batch": args.batch,
            "index_build_s": round(build_s, 2),
            "probe_s": round(probe_s, 2), "matches": matches,
        }), flush=True)
        corpus.unpersist()
        shutil.rmtree(wh, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
