"""Dedup subquadratic-scale evidence (VERDICT r2 #5).

Runs ngram_jaccard_pairs and minhash_lsh_dedup over the sf0.1 documents
corpus at 1x and 10x (replicas get per-replica token rotation so they
share no shingles — corpus grows, true pair count stays per-replica),
with the hot-shingle knob planting footer boilerplate in 30% of docs at
BOTH scales.  Reports wall seconds, candidate-pair counts (the
inverted-index join size / LSH band-join size) and output pairs, so the
growth exponent is measurable: subquadratic means candidates and wall
grow ~10x when the corpus grows 10x, not ~100x.

    python scripts/bench_dedup_scale.py [--factor 10] [--cores 32]

Writes one JSON line per (scale, query) to stdout; paste the table into
BENCH/ROUNDS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.corpus import with_hot_shingle  # noqa: E402
from crawler_spark.functions import dedup  # noqa: E402
from crawler_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_docs(spark, factor: int):
    """sf0.1 documents x factor; replica r rotates the a-z alphabet by r
    so replicas share no shingles (corpus grows, pair structure per
    replica preserved)."""
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n = base.count()
    parts = []
    alpha = string.ascii_lowercase
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
    return with_hot_shingle(out, hot_frac=0.3), n * factor


def join_pair_count(sh, max_df):
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df_"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("df_") <= max_df)
    row = dfreq.agg(
        F.sum(F.col("df_") * (F.col("df_") - 1) / 2).alias("p")
    ).collect()[0]
    return int(row.p or 0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--max-df", type=int, default=1000)
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)

    for factor in (1, args.factor):
        docs, n_docs = replicated_docs(spark, factor)
        docs = docs.persist()
        docs.count()

        sh = dedup.shingles(docs, "doc_id", "text", 3).persist()
        cand_ngram = join_pair_count(sh, args.max_df)
        cand_ngram_uncapped = join_pair_count(sh, None)

        t0 = time.time()
        out_ngram = dedup.ngram_jaccard_pairs(
            docs, "doc_id", threshold_micro=500_000, max_df=args.max_df
        ).count()
        w_ngram = time.time() - t0

        t0 = time.time()
        sig = dedup.minhash_signatures(sh)
        cand_mh = dedup.lsh_candidate_pairs(sig).count()
        out_mh = dedup.minhash_lsh_dedup(
            docs, "doc_id", threshold_micro=500_000
        ).count()
        w_mh = time.time() - t0

        for name, wall, cand, outp in (
            ("ngram_jaccard", w_ngram, cand_ngram, out_ngram),
            ("minhash_lsh", w_mh, cand_mh, out_mh),
        ):
            print(json.dumps({
                "query": name, "scale_factor": factor, "n_docs": n_docs,
                "wall_sec": round(wall, 2), "candidate_pairs": cand,
                "output_pairs": outp,
                **({"uncapped_join_pairs": cand_ngram_uncapped}
                   if name == "ngram_jaccard" else {}),
            }), flush=True)
        sh.unpersist()
        docs.unpersist()


if __name__ == "__main__":
    main()
