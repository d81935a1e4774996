"""Two-phase salted rank (hot-host skew defense): for ANY frontier the
scheduled/deferred split must be identical to the unsalted exact rank —
phase 1 defers, never drops (SURVEY.md §7 hard part 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark import rules
from crawler_spark.politeness import rank_by_budget


def _frontier(spark, n=5000, hot_frac=0.6):
    """Synthetic frontier: hot_frac of rows on ONE host, rest spread."""
    return spark.range(n).select(
        F.col("id").alias("seq"),
        F.format_string("https://h%d.test/p/%d", F.col("id"), F.col("id")).alias("url_norm"),
        F.xxhash64(F.col("id")).alias("url_hash"),
        F.when(F.col("id") % 10 < int(hot_frac * 10), "hot.test")
        .otherwise(F.format_string("cold%d.test", F.col("id") % 97)).alias("host"),
        F.lit("t").alias("task_name"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.lit(None).cast("int").alias("robots_budget"),
    )


def _task():
    return {"t": rules.Task(name="t", rules={}, seeds=(), rate_limits=((10, 30),))}


def _key(df):
    return sorted((r.seq, r.host) for r in df.collect())


def test_salted_rank_equals_exact(spark):
    fr = _frontier(spark)
    s1, d1 = rank_by_budget(fr, _task(), round_seconds=30.0, salt_buckets=1)
    s8, d8 = rank_by_budget(fr, _task(), round_seconds=30.0, salt_buckets=8)
    assert _key(s1) == _key(s8)
    assert _key(d1) == _key(d8)
    # budget respected on the hot host: 10 = floor(10/30 * 30)
    hot = [k for k in _key(s8) if k[1] == "hot.test"]
    assert len(hot) == 10
    # and the scheduled hot rows are exactly the top-(priority, seq) ones
    all_hot = sorted(
        ((-r.priority, r.seq) for r in fr.where(F.col("host") == "hot.test").collect())
    )[:10]
    got_hot = sorted(
        (-r.priority, r.seq)
        for r in s8.where(F.col("host") == "hot.test").collect()
    )
    assert got_hot == all_hot
