"""Crawl snapshot differencing: what changed between two crawls of the
same URL space.  The reference crawls once and stops; a production
crawler re-crawls, and the diff of content fingerprints between
snapshot t and t+1 is what drives recrawl scheduling (hosts that churn
get re-crawled sooner) and incremental downstream processing (only
'added'/'changed' pages re-enter the parse/dedup pipeline).

Scale shape: one full-outer join co-partitioned on the url key — with
both snapshots bucketed by url_hash (crawler_spark/catalog.py's
frontier bucketing), this is a shuffle-free zipper merge; unbucketed it
is a single well-partitioned shuffle.  Everything downstream (status
classification, per-host churn rates) is codegen'd expressions and one
map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Classify every url across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, fingerprint differs).
    Unchanged urls are dropped — at web scale the unchanged set is the
    overwhelming majority and materializing it defeats the point of an
    incremental diff."""
    a = old.select(F.col(key_col).alias("k"), F.col(fp_col).alias("fp_old"))
    b = new.select(F.col(key_col).alias("k"), F.col(fp_col).alias("fp_new"))
    j = a.join(b, "k", "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
    )
    return (
        j.select(F.col("k").alias(key_col), status.alias("status"))
        .where(F.col("status").isNotNull())
    )


def churn_by_key(
    diff: DataFrame, group_col: str, key_col: str = "url"
) -> DataFrame:
    """Per-group churn counts over a snapshot diff — the recrawl
    scheduler's input: ``(group, n_added, n_removed, n_changed)``."""
    return diff.groupBy(group_col).agg(
        F.sum((F.col("status") == "added").cast("long")).alias("n_added"),
        F.sum((F.col("status") == "removed").cast("long")).alias("n_removed"),
        F.sum((F.col("status") == "changed").cast("long")).alias("n_changed"),
    )
