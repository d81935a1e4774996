"""registered_domain politeness at scale shape (VERDICT r4 #9): a
subdomain-heavy frontier must COLLAPSE to one budget per registrable
domain, and the salted two-phase rank must stay exact under a
mega-domain hot key (the swap politeness.rank_by_budget documents).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark import rules
from crawler_spark.politeness import rank_by_budget


def _frontier(spark, n=6000, hot_frac=0.7, n_subdomains=500):
    """hot_frac of rows spread across n_subdomains subdomains of ONE
    registrable domain (mega.co.uk); the rest on distinct registrable
    domains.  Per-HOST budgets see ~n/n_subdomains rows per hot host
    (under budget, nothing deferred); the per-DOMAIN key sees them as
    one giant key — the skew case."""
    hot_pct = int(hot_frac * 10)
    return spark.range(n).select(
        F.col("id").alias("seq"),
        F.format_string("https://x/p/%d", F.col("id")).alias("url_norm"),
        F.xxhash64(F.col("id")).alias("url_hash"),
        F.when(
            F.col("id") % 10 < hot_pct,
            F.format_string(
                "shard%d.cdn.mega.co.uk", F.col("id") % n_subdomains
            ),
        ).otherwise(F.format_string("cold%d.test", F.col("id") % 97))
        .alias("host"),
        F.lit("t").alias("task_name"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.lit(None).cast("int").alias("robots_budget"),
    )


def _task(rate=10):
    return {"t": rules.Task(name="t", rules={}, seeds=(),
                            rate_limits=((rate, 30),))}


def _key(df):
    return sorted((r.seq, r.host) for r in df.collect())


def test_budget_collapses_across_subdomains(spark):
    fr = _frontier(spark)
    by_host, _ = rank_by_budget(
        fr, _task(), round_seconds=30.0, politeness_key="host"
    )
    by_dom, _ = rank_by_budget(
        fr, _task(), round_seconds=30.0, politeness_key="registered_domain"
    )
    hot_host = by_host.where(F.col("host").endswith("mega.co.uk")).count()
    hot_dom = by_dom.where(F.col("host").endswith("mega.co.uk")).count()
    # per-host: 500 subdomains x min(budget, rows-per-subdomain);
    # per-domain: exactly ONE budget for the whole registrable domain
    assert hot_dom == 10  # floor(10/30 * 30)
    assert hot_host > 50 * hot_dom, (hot_host, hot_dom)
    # cold (distinct registrable) domains are unaffected by the key
    cold_host = by_host.where(~F.col("host").endswith("mega.co.uk"))
    cold_dom = by_dom.where(~F.col("host").endswith("mega.co.uk"))
    assert _key(cold_host) == _key(cold_dom)


def test_salted_regdomain_rank_equals_exact(spark):
    """The two-phase salted swap must be output-identical under the
    registered_domain key with a mega-domain hot key — phase 1 ranks
    within (task, pkey, salt) and can only DEFER, never drop."""
    fr = _frontier(spark)
    s1, d1 = rank_by_budget(
        fr, _task(), round_seconds=30.0, salt_buckets=1,
        politeness_key="registered_domain",
    )
    s16, d16 = rank_by_budget(
        fr, _task(), round_seconds=30.0, salt_buckets=16,
        politeness_key="registered_domain",
    )
    assert _key(s1) == _key(s16)
    assert _key(d1) == _key(d16)
    # and the scheduled mega-domain rows are exactly the global
    # top-(priority, seq) 10 across ALL its subdomains
    hot = fr.where(F.col("host").endswith("mega.co.uk"))
    expect = sorted(((-r.priority, r.seq) for r in hot.collect()))[:10]
    got = sorted(
        (-r.priority, r.seq)
        for r in s16.where(F.col("host").endswith("mega.co.uk")).collect()
    )
    assert got == expect
