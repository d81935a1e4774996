"""Crawl-trap detection: flag hosts whose URL space is combinatorial
over few path shapes — calendar pages, session-id echoes, faceted
search — so the frontier can cap or deprioritize them before they eat
the politeness budget.  (The reference bounds damage per page with the
top-3 link truncation, parsers.py F10; this is the host-level
generalization a web-scale frontier needs.)

Heuristic: collapse every path to a TEMPLATE by replacing digit runs
with '#' and dropping the query string, then per host measure how many
urls share how few templates.  A host serving 10^6 urls over 3
templates is a trap; a host serving 10^3 urls over 900 templates is a
site.  All ratios integer micro-units.

Scale shape: templating is a scan-local codegen regexp_replace; the
rollup is one (host, template) shuffle with map-side combine then one
host shuffle — identical cost to any per-host agg.  The top-template
winner is a min(struct(-count, template)) partial aggregation, not a
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def path_template(url: Column) -> Column:
    """Strip the query/fragment, lower-case, digit runs -> '#'."""
    path = F.regexp_replace(F.lower(url), r"[?#].*$", "")
    return F.regexp_replace(path, r"[0-9]+", "#")


def trap_scores(
    urls: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """Per-host template-concentration stats: ``(host, n_urls,
    n_templates, urls_per_template_micro, top_template,
    top_share_micro)``.  Downstream schedulers threshold
    ``urls_per_template_micro`` (avg urls per shape) and
    ``top_share_micro`` (mass in the hottest shape) to cap admission."""
    t = urls.select(
        F.col(host_col).alias("host"),
        path_template(F.col(url_col)).alias("tmpl"),
    )
    g = t.groupBy("host", "tmpl").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        g.groupBy("host")
        .agg(
            F.sum("cnt").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_templates"),
            F.min(
                F.struct((-F.col("cnt")).alias("negcnt"), F.col("tmpl"))
            ).alias("w"),
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            F.floor(F.col("n_urls") * 1_000_000 / F.col("n_templates"))
            .cast("long").alias("urls_per_template_micro"),
            F.col("w.tmpl").alias("top_template"),
            F.floor(-F.col("w.negcnt") * 1_000_000 / F.col("n_urls"))
            .cast("long").alias("top_share_micro"),
        )
    )
