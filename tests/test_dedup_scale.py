"""max_df cap vs the hot-shingle corpus knob (VERDICT r2 #5): planted
boilerplate shared by far more than max_df documents must not blow the
inverted-index self-join up quadratically, and must not change the
reported near-dup pairs among ordinary documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.corpus import HOT_SHINGLE_TEXT, with_hot_shingle
from crawler_spark.functions import dedup


def _corpus(spark, n_docs=1200, hot_frac=0.5):
    """n_docs docs of distinct 12-token texts (md5-derived tokens, so no
    accidental sharing), boilerplate appended to hot_frac of them."""
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.substring(F.md5(F.concat_ws("|", F.lit(j), F.col("id"))), 1, 10)
                for j in range(12)
            ],
        ).alias("text"),
    )
    return with_hot_shingle(docs, hot_frac=hot_frac)


def _join_pair_count(sh):
    """sum over shingles of C(df, 2) == exact inverted-index join size."""
    return (
        sh.groupBy("shingle").agg(F.count("*").alias("df_"))
        .agg(F.sum(F.col("df_") * (F.col("df_") - 1) / 2).alias("p"))
        .collect()[0].p
    )


def test_max_df_cap_keeps_join_subquadratic(spark):
    n_docs, hot_frac, max_df = 1200, 0.5, 100
    df = _corpus(spark, n_docs, hot_frac)
    sh = dedup.shingles(df, "doc_id", "text", 3)

    n_hot = n_docs * hot_frac
    uncapped = _join_pair_count(sh)
    assert uncapped >= n_hot * (n_hot - 1) / 2  # quadratic in the hot set

    keep = sh.groupBy("shingle").agg(F.count("*").alias("df_")).where(
        F.col("df_") <= max_df
    )
    capped = _join_pair_count(sh.join(keep.select("shingle"), "shingle"))
    # the cap removes the quadratic hot term entirely; what remains is
    # bounded by n_docs * shingles_per_doc * (max_df - 1)
    assert capped < uncapped / 20, (capped, uncapped)
    assert capped < n_docs * 16 * max_df


def test_max_df_cap_preserves_ordinary_pairs(spark):
    """Planted boilerplate must not CREATE pairs (capped) and the capped
    run must still find real near-dups: plant one true twin pair."""
    df = _corpus(spark, 400, 0.5)
    twin = df.where(F.col("doc_id") == 1).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    allv = df.unionByName(twin)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.ngram_jaccard_pairs(
            allv, "doc_id", threshold_micro=500_000, max_df=100
        ).collect()
    }
    assert (1, 10_001) in pairs
    # no pair exists ONLY because of the boilerplate: every reported pair
    # shares >= half its real shingles, and boilerplate-only overlap for
    # two 12-token docs is ~6/|union| << threshold.  (hot docs are
    # id % 100 < 50)
    hot_only = [
        (a, b) for a, b in pairs
        if a != 1 and a % 100 < 50 and b % 100 < 50
        and b < 10_000 and a < 10_000
    ]
    assert not hot_only, hot_only[:5]


def test_hot_shingle_knob_plants_expected_df(spark):
    df = with_hot_shingle(
        spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit("plain body text here").alias("text")
        ),
        hot_frac=0.25,
    )
    n_hot = df.where(F.col("text").contains(HOT_SHINGLE_TEXT)).count()
    assert n_hot == 25
