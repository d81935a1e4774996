"""Deterministic hash-stratified sampling: reproducible, seed-sensitive,
fraction-accurate."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions import textops


def _docs(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )


def test_sample_deterministic_and_sized(spark):
    docs = _docs(spark)
    frac = {"a": 0.25, "b": 0.05}
    s1 = {r.doc_id for r in textops.sample_stratified(docs, frac).collect()}
    s2 = {r.doc_id for r in textops.sample_stratified(docs, frac).collect()}
    assert s1 == s2  # pure function of (key, seed)
    a = sum(1 for d in s1 if d % 2 == 0) / 2000
    b = sum(1 for d in s1 if d % 2 == 1) / 2000
    assert abs(a - 0.25) < 0.05 and abs(b - 0.05) < 0.03
    s3 = {r.doc_id for r in textops.sample_stratified(docs, frac, seed="v2").collect()}
    assert s3 != s1  # a new seed is a fresh sample
    # unknown stratum defaults to default_fraction (0 -> dropped)
    extra = docs.withColumn("source", F.lit("zzz"))
    assert textops.sample_stratified(extra, frac).count() == 0
