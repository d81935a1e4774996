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


def revisit_records(
    fetches: DataFrame,
    key_col: str = "url_id",
    digest_col: str = "digest",
    epoch_col: str = "epoch",
) -> DataFrame:
    """WARC revisit-record classification (the Common Crawl / IIPC
    archive-dedup convention): across repeated fetches of the same URL,
    only the FIRST capture of each distinct content digest is stored as
    a full ``response`` record; any later fetch whose digest was already
    captured for that URL becomes a ``revisit`` record pointing at the
    original capture's epoch — the archive stores the pointer, not the
    bytes.

    Input: one row per fetch ``(url_id, epoch, digest)``.  Output adds
    ``record_type`` ('response' | 'revisit') and ``refers_to_epoch``
    (the original capture's epoch; equals ``epoch`` for responses, so
    the column is total and the payload-bytes-saved rollup is
    ``sum(length where record_type = 'revisit')``).

    Scale shape: ONE window over ``(url_id, digest)`` ordered by epoch
    — a single shuffle co-partitioned with every other per-url rollup
    in this module; with the fetch log bucketed by url_hash (the
    frontier's bucketing) it is shuffle-free.  No state, no driver
    participation, trivially incremental per crawl batch.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col, digest_col)
    first_epoch = F.min(epoch_col).over(w)
    return fetches.select(
        "*",
        F.when(F.col(epoch_col) == first_epoch, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("record_type"),
        first_epoch.alias("refers_to_epoch"),
    )


def recrawl_priority(
    history: DataFrame,
    now_epoch: int,
    base_interval: int = 16,
    min_interval: int = 1,
    max_interval: int = 64,
    key_col: str = "url_id",
    host_col: str = "host",
) -> DataFrame:
    """Change-rate recrawl scheduling (the Cho & Garcia-Molina
    frequency-estimation shape, WebDB 2000, in integer fixed point):
    from an observation ``history (url_id, host, epoch, changed)`` —
    one row per url per past crawl, ``changed`` 1 iff the content
    fingerprint differed from the previous crawl — estimate each url's
    revisit interval inversely to its observed change rate and score
    how overdue it is now.

        interval(url)     = clamp(base * (n_obs + 1) // (n_changes + 1),
                                  min_interval, max_interval)
        overdue_micro(url)= (now - last_observed) * 1e6 // interval

    A url that changed on every visit converges to ~base/n_obs (crawl
    hot pages often); one that never changed climbs toward the clamp
    ceiling (back off).  The +1 Laplace terms keep fresh urls (1 obs)
    near the base interval instead of the extremes.  All arithmetic is
    integer floor division — bit-identical across engines, so the whole
    estimator is DuckDB-oracle-checkable.

    Scale shape: the history table is an append-only fact keyed on
    url; the estimator is ONE map-side-combined groupBy(url) over it,
    and the output joins the frontier on url_hash — no window, no
    driver state.  At 10^10 urls x K observations this is the same
    single shuffle as any per-url rollup."""
    agg = history.groupBy(key_col, host_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col("changed").cast("long")).alias("n_changes"),
        F.max("epoch").alias("last_epoch"),
    )
    raw = F.floor(
        F.lit(base_interval) * (F.col("n_obs") + 1) / (F.col("n_changes") + 1)
    )
    interval = F.least(
        F.greatest(raw, F.lit(min_interval)), F.lit(max_interval)
    ).cast("long")
    return agg.select(
        key_col,
        host_col,
        F.col("n_obs").cast("long"),
        F.col("n_changes").cast("long"),
        interval.alias("interval"),
        F.floor(
            (F.lit(now_epoch) - F.col("last_epoch")) * 1_000_000 / interval
        ).cast("long").alias("overdue_micro"),
    )


def cache_policy(
    df: DataFrame,
    id_col: str = "doc_id",
    headers_col: str = "headers",
    default_ttl_s: int = 86_400,
    min_ttl_s: int = 60,
    max_ttl_s: int = 30 * 86_400,
) -> DataFrame:
    """HTTP caching-header policy extraction: what the SERVER says
    about refetching, as scheduler-ready columns — the header-driven
    complement of the observed-churn model (:func:`recrawl_priority`
    infers change rates from snapshots; this reads the declared ones).
    The reference ignores caching headers entirely (collect.go).

    Parsed from the raw response-header block (as WARC records carry
    it): ``max_age_s`` (Cache-Control max-age; s-maxage wins when both
    present, per RFC 9111 shared-cache rules), ``no_store`` /
    ``no_cache`` flags, ``has_etag`` / ``has_validator`` (ETag or
    Last-Modified present -> a conditional GET can revalidate for
    ~free, so the scheduler can probe cheaply even when stale).

    ``refetch_after_s`` is the decision column: no_store -> min_ttl
    (the server forbids reuse; probe at the politeness floor),
    declared max-age (no_cache treated as max-age=0) clamped to
    [min_ttl, max_ttl] (declared 10-year TTLs and max-age=0 both lie
    at web scale), else ``default_ttl_s`` when the server says
    nothing.

    Scale shape: ZERO shuffle — case-insensitive regexp extracts and
    a CASE chain in one codegen scan projection; no date parsing (the
    Expires fallback needs RFC-1123 dates, whose locale parsing is
    engine-specific — max-age dominates on the real web and the
    default TTL covers the rest).
    """
    h = F.col(headers_col)
    smax = F.regexp_extract(h, r"(?i)cache-control:[^\r\n]*s-maxage=(\d+)", 1)
    # boundary group keeps the max-age literal from substring-matching
    # inside s-maxage= (ADVICE r4): the directive follows either the
    # header colon directly or a space/comma/semicolon separator per
    # RFC 9111 grammar — never a letter/hyphen
    mage = F.regexp_extract(
        h, r"(?i)cache-control:(?:[^\r\n]*[ ,;])?max-age=(\d+)", 1
    )
    declared = F.when(smax != "", smax.cast("long")).when(
        mage != "", mage.cast("long")
    )
    no_store = h.rlike(r"(?i)cache-control:[^\r\n]*no-store")
    no_cache = h.rlike(r"(?i)cache-control:[^\r\n]*no-cache")
    has_etag = h.rlike(r"(?i)^etag:|[\r\n]etag:")
    has_lm = h.rlike(r"(?i)^last-modified:|[\r\n]last-modified:")
    clamp = F.least(
        F.greatest(
            F.when(no_cache, F.lit(0)).otherwise(declared),
            F.lit(min_ttl_s),
        ),
        F.lit(max_ttl_s),
    )
    refetch = (
        F.when(no_store, F.lit(min_ttl_s))
        .when(no_cache | declared.isNotNull(), clamp)
        .otherwise(F.lit(default_ttl_s))
    )
    return df.select(
        F.col(id_col),
        declared.cast("long").alias("max_age_s"),
        no_store.alias("no_store"),
        no_cache.alias("no_cache"),
        has_etag.alias("has_etag"),
        (has_etag | has_lm).alias("has_validator"),
        refetch.cast("long").alias("refetch_after_s"),
    )


def refetch_schedule(
    df: DataFrame,
    id_col: str = "doc_id",
    prev_interval_col: str = "prev_interval_s",
    changed_col: str = "changed",
    max_age_col: str = "max_age_s",
    no_store_col: str = "no_store",
    min_ttl_s: int = 60,
    max_ttl_s: int = 30 * 86_400,
) -> DataFrame:
    """Adaptive revisit scheduling: ``(id, next_interval_s, source)``.

    The classic multiplicative policy (Cho & Garcia-Molina's adaptive
    revisiting, used by every production crawler since): HALVE the
    revisit interval when the last fetch found the page changed,
    DOUBLE it when unchanged, clamped to [min_ttl, max_ttl] — then
    floor the result by the freshness the server itself declared
    (:func:`cache_policy`'s max-age): probing inside the declared
    freshness lifetime is wasted politeness budget, because a
    compliant cache would not even forward the request.  ``no_store``
    declares nothing about change rate, so it contributes no floor.

    ``source`` says which bound won ('adaptive' or 'declared') so the
    scheduler's behavior is auditable per URL.

    Scale shape: ZERO shuffle — integer halve/double, two clamps and
    a greatest() in one codegen scan projection; composes upstream of
    the frontier priority the same way recrawl_priority does.
    """
    prev = F.col(prev_interval_col)
    adaptive = F.least(
        F.greatest(
            F.when(F.col(changed_col), (prev / 2).cast("long"))
            .otherwise(prev * 2),
            F.lit(min_ttl_s),
        ),
        F.lit(max_ttl_s),
    )
    declared = F.when(
        ~F.col(no_store_col) & F.col(max_age_col).isNotNull(),
        F.least(F.greatest(F.col(max_age_col), F.lit(min_ttl_s)),
                F.lit(max_ttl_s)),
    ).otherwise(F.lit(min_ttl_s))
    nxt = F.greatest(adaptive, declared)
    return df.select(
        F.col(id_col),
        nxt.cast("long").alias("next_interval_s"),
        F.when(declared > adaptive, F.lit("declared"))
        .otherwise(F.lit("adaptive")).alias("source"),
    )
