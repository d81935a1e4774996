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


def test_sample_temperature_rebalances(spark):
    # 9:1 skewed corpus: source 'big' 3600 docs, 'small' 400 docs.
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, "big").otherwise("small").alias("source"),
    )
    kept = textops.sample_temperature(docs, target_frac_micro=200_000).collect()
    kept2 = textops.sample_temperature(docs, target_frac_micro=200_000).collect()
    assert {r.doc_id for r in kept} == {r.doc_id for r in kept2}  # deterministic
    n_big = sum(1 for r in kept if r.source == "big")
    n_small = sum(1 for r in kept if r.source == "small")
    # overall expected fraction ~= 20%
    assert abs(len(kept) / 4000 - 0.2) < 0.03
    # sqrt temperature: per-doc keep rate of the small source must exceed
    # the big source's by ~sqrt(9) = 3x
    ratio = (n_small / 400) / (n_big / 3600)
    assert 2.0 < ratio < 4.5


def test_host_cap_partition_invariance(spark):
    """sample_host_cap must pick the SAME survivors regardless of input
    partitioning (the pick is hash-ordered, never partition-ordered)."""
    from crawler_spark.functions import textops

    rows = [(i, f"s{i % 7}") for i in range(400)]
    df1 = spark.createDataFrame(rows, "doc_id long, source string")
    df8 = df1.repartition(8)
    a = {r.doc_id for r in textops.sample_host_cap(df1, cap=9).collect()}
    b = {r.doc_id for r in textops.sample_host_cap(df8, cap=9).collect()}
    assert a == b and len(a) == 7 * 9
