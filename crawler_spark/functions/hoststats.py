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


def host_suffixes(host) -> "F.Column":
    """All label-boundary suffixes of a hostname, longest first:
    a.b.example.com -> [a.b.example.com, b.example.com, example.com,
    com].  Pure higher-order functions (split/sequence/slice/
    array_join): scan-local, no UDF."""
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def tag_blocked(
    df: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    out_col: str = "blocked",
) -> DataFrame:
    """Domain-blocklist tagging (the UT1/RefinedWeb blocklist stage): a
    host is blocked iff it equals a blocklisted domain OR is a
    subdomain of one (label-boundary suffix match, so `notads.com`
    does NOT match `ads.com`).

    Scale shape: the corpus is never shuffled.  Each row explodes into
    its <=~6 host suffixes (scan-local), the suffixes hit the blocklist
    by a BROADCAST hash join (UT1 category lists are MB-scale), and
    only the matched id set — bounded by the block hit rate, typically
    a few percent — is distinct-shuffled and broadcast back as the tag.
    To DROP instead of tag (the usual pipeline use), anti-join the same
    hit set; same cost.  If the hit set can exceed broadcast size
    (adversarial corpus), fall back to groupBy(id) over the exploded
    join output — one corpus shuffle, still correct.
    """
    sfx = df.select(
        F.col(id_col).alias("__bid"),
        F.explode(host_suffixes(host_col)).alias("__sfx"),
    )
    hits = (
        sfx.join(
            F.broadcast(blocklist.select(F.col("domain").alias("__sfx"))),
            "__sfx",
            "left_semi",
        )
        .select("__bid")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    out = df.join(
        F.broadcast(hits), df[id_col] == hits["__bid"], "left"
    ).drop("__bid")
    return out.withColumn(out_col, F.coalesce(F.col("__hit"), F.lit(False))).drop(
        "__hit"
    )


def mirror_hosts(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_shared: int = 2,
    threshold_micro: int = 500_000,
    max_hosts_per_fp: int | None = 1_000,
) -> DataFrame:
    """Mirror/alias HOST-pair detection: ``(host_lo, host_hi, shared,
    overlap_micro)`` for host pairs whose page-content fingerprints
    overlap — the site-level complement of the doc-level dedup family.
    Web corpora carry the same site under many hostnames (www/apex,
    country mirrors, CDN aliases, scraped re-hosts); doc-level dedup
    removes the pages one by one, but the *scheduler* needs the host
    relation itself to stop crawling the mirror at the frontier (the
    reference crawls every seed independently and would fetch a mirror
    site in full).  overlap_micro = floor(shared * 1e6 / min(|fp set|))
    — containment on the SMALLER host, so a small alias fully inside a
    big site scores ~1e6 even though the big site has more pages.

    Scale shape: the corpus is reduced ONCE to distinct (host, fp)
    rows (fingerprint is scan-local codegen); pair generation is an
    inverted-index self-join keyed by fingerprint — shuffle bounded by
    posting-list sizes, never all-pairs over hosts.  The posting list
    of a fingerprint is capped at ``max_hosts_per_fp`` (default 1000):
    a page body shared by MORE hosts than that is web-wide boilerplate
    (parked-domain lander, CMS default page) whose pairs are
    meaningless and whose posting list alone would be quadratic —
    same stop-key discipline as the shingle kernels' ``max_df``.
    ``min_shared`` (default 2) kills single-shared-page noise pairs
    before the size join.
    """
    hf = df.select(
        F.col(host_col).alias("host"),
        textops.fingerprint_md5(F.col(text_col)).alias("fp"),
    ).distinct()
    sizes = hf.groupBy("host").agg(F.count(F.lit(1)).alias("n_fp"))
    if max_hosts_per_fp is not None:
        keep = (
            hf.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df_"))
            .where(F.col("df_") <= max_hosts_per_fp)
        )
        hf = hf.join(keep.select("fp"), "fp")
    a, b = hf.alias("a"), hf.alias("b")
    pairs = (
        a.join(b, "fp")
        .where(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_lo"),
            F.col("b.host").alias("host_hi"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    return (
        pairs.join(
            sizes.select(F.col("host").alias("host_lo"),
                         F.col("n_fp").alias("n_lo")),
            "host_lo",
        )
        .join(
            sizes.select(F.col("host").alias("host_hi"),
                         F.col("n_fp").alias("n_hi")),
            "host_hi",
        )
        .withColumn(
            "overlap_micro",
            F.floor(
                F.col("shared") * 1_000_000 / F.least("n_lo", "n_hi")
            ).cast("long"),
        )
        .where(F.col("overlap_micro") >= threshold_micro)
        .select("host_lo", "host_hi",
                F.col("shared").cast("long").alias("shared"),
                "overlap_micro")
    )


# ------------------------------------------------ registered domain
# Curated subset of the Public Suffix List (publicsuffix.org — public
# data); the seam for a full-PSL deployment is the `suffixes` argument.
# Multi-label entries first-class: politeness/quota keys at web scale
# group by REGISTRABLE domain, not hostname (shop.example.co.uk and
# www.example.co.uk are one crawl-budget owner; example.co.uk and
# other.co.uk are not).
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "com", "net", "org", "io", "dev", "app", "info", "biz", "xyz",
    "gov", "edu", "mil", "co", "us", "uk", "de", "fr", "jp", "cn",
    "ru", "br", "in", "au",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.tw", "com.sg", "co.za",
    "github.io", "blogspot.com",
)


def domain_split(
    df: DataFrame,
    splits: tuple[tuple[str, int], ...] = (
        ("train", 800_000),
        ("dev", 100_000),
        ("test", 100_000),
    ),
    host_col: str = "host",
    out_col: str = "split",
    seed: str = "split",
) -> DataFrame:
    """Leakage-free train/dev/test assignment keyed by REGISTRABLE
    domain: every document is tagged with the split its registrable
    domain (PSL, :func:`registered_domain`; hostname fallback when the
    host has none) hashes into, so no domain ever straddles the
    train/eval boundary — the standard web-corpus decontamination
    practice (doc-granularity splits leak near-duplicate boilerplate,
    templates, and mirrored pages from the same site into eval; the
    reference crawler has no analog because it never partitions data).

    ``splits`` is an ordered list of (name, weight_micro) summing to
    1e6; assignment = the first split whose cumulative weight exceeds
    the doc's domain hash bucket (md5-derived, :func:`textops.
    hash_bucket_micro` convention, so DuckDB reproduces the exact
    assignment).  Deterministic: a pure function of (domain, seed) —
    re-ingesting the corpus, repartitioning, or adding new docs from a
    known domain never moves existing domains across splits.

    Scale shape: ZERO shuffle — registrable-domain extraction, the
    hash, and the cumulative-weight CASE chain are all scan-local
    codegen expressions; there is no per-domain aggregation because the
    assignment depends only on the domain string itself.
    """
    total = sum(w for _, w in splits)
    if total != 1_000_000:
        raise ValueError(f"split weights must sum to 1e6 micro, got {total}")
    key = F.coalesce(registered_domain(host_col), F.col(host_col))
    bucket = textops.hash_bucket_micro(key, seed)
    cum = 0
    expr = None
    for name, w in splits:
        cum += w
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out_col, expr)


def registered_domain(
    host, suffixes: tuple[str, ...] = PUBLIC_SUFFIXES
) -> "F.Column":
    """Registrable (PSL) domain of a hostname, pure scan-local
    expressions — no UDF, no join (the suffix list is a compile-time
    IN literal; a full PSL at ~9k rows would swap this for the same
    broadcast suffix join tag_blocked uses).

    Rules (PSL algorithm on the curated list):
    - longest listed suffix wins (host_suffixes is longest-first, so
      the FIRST listed match is the longest listed one);
    - registered domain = matched suffix plus ONE more label;
    - a host that IS a public suffix has no registrable domain (null);
    - no listed match -> the default '*' rule: the last label is the
      public suffix (single-label hosts -> null).
    """
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    cand = F.filter(host_suffixes(host), lambda s: s.isin(*suffixes))
    psfx = F.coalesce(
        F.get(cand, 0),  # strict element_at throws on empty; get -> null
        F.element_at(labels, -1),  # '*' default rule
    )
    k = F.size(F.split(psfx, r"\."))
    return F.when(
        n > k, F.array_join(F.slice(labels, n - k, k + 1), ".")
    ).otherwise(F.lit(None).cast("string"))
