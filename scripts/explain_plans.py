#!/usr/bin/env python3
"""Dump formatted physical plans for the engine's load-bearing shapes
into PLANS.md, with the properties each plan must exhibit (broadcast
build side, pushed filters, column pruning, whole-stage codegen spans).
Run after planner-affecting changes; the diff of PLANS.md is the review
artifact."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    from crawler_spark import corpus, engine, rules
    from crawler_spark.entry_queries import QUERIES
    from crawler_spark.frontier import seed_frontier, with_url_identity
    from crawler_spark.parsers import dispatch_cols
    from crawler_spark.session import get_spark

    spark = get_spark("plans", cores=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = "/tmp/plans_corpus"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        corpus.write_corpus(spark, pages_path, n_hosts=4, n_filler=50)

    sections: list[tuple[str, str, str]] = []

    # 1. the round's fetch+parse single pass
    tasks = rules.synthetic_tasks(n_book_hosts=4, n_sun_hosts=4)
    pages = engine.prepare_pages(spark.read.parquet(pages_path))
    sched = with_url_identity(seed_frontier(spark, tasks).limit(10))
    hits = pages.join(
        F.broadcast(sched.select("url_norm", "task_name", "rule_name", "url", "tmp")),
        on="url_norm", how="inner",
    ).withColumn("body", F.decode(F.col("html"), "UTF-8"))
    parsed = hits.select(
        "url_norm",
        *[c.alias(k) for k, c in dispatch_cols(tasks, "body").items()],
    )
    sections.append((
        "Round fetch+parse (ONE corpus pass)",
        "MUST: BroadcastHashJoin with the scheduled set as build side "
        "(corpus streamed, never shuffled); scan ReadSchema limited to "
        "url/html (column pruning — text/lang/warc_ts never read); "
        "decode + every rule kernel inside one WholeStageCodegen span "
        "above the join.",
        explain_str(parsed),
    ))

    # 1b. the same fetch join with the broadcast gate OFF
    # (n_scheduled > broadcast_max_rows): hint dropped, strategy left to
    # AQE/statistics — the 100x-scale fallback shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hits_nb = pages.join(
            sched.select("url_norm", "task_name", "rule_name", "url", "tmp"),
            on="url_norm", how="inner",
        ).withColumn("body", F.decode(F.col("html"), "UTF-8"))
        parsed_nb = hits_nb.select(
            "url_norm",
            *[c.alias(k) for k, c in dispatch_cols(tasks, "body").items()],
        )
        nb_plan = explain_str(parsed_nb)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    sections.append((
        "Round fetch+parse, size-gated fallback (broadcast_max_rows exceeded)",
        "MUST: NO broadcast hint on the build side — an unbounded "
        "scheduled set (10^7 hosts x big budgets) must never be forced "
        "into the driver; strategy is left to statistics/AQE "
        "(emulated here with autoBroadcastJoinThreshold=-1 to stand in "
        "for a build side whose stats exceed the broadcast budget: the "
        "plan degrades to SortMergeJoin instead of OOMing the driver).  "
        "At 100 TB the corpus is bucketed by url_norm so this shuffle "
        "is one-sided.",
        nb_plan,
    ))

    # 2. frontier scheduling shape: anti-join + windowed budget rank
    sections.append((
        "schedule_round (dedup anti-join + per-source budget rank)",
        "MUST: LEFT ANTI BroadcastHashJoin; a single Window (rank) after "
        "one shuffle on the partition key; filter on rank is applied "
        "post-window without a second shuffle.",
        explain_str(QUERIES["schedule_round"](spark, "/root/testdata/sf0.001")),
    ))

    # 3. parquet pushdown witness
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pushed = docs.where(F.col("doc_id") < 100).select("doc_id", "source")
    sections.append((
        "Predicate pushdown + column pruning witness",
        "MUST: PushedFilters [IsNotNull(doc_id), LessThan(doc_id,100)]; "
        "ReadSchema contains only doc_id, source.",
        explain_str(pushed),
    ))

    # 4. minhash LSH (shuffle-bounded self-join on band signature)
    sections.append((
        "dedup_minhash_lsh (band-signature candidate join)",
        "MUST: the self-join key is (band, bsig) — shuffle bounded by "
        "band buckets, never an all-pairs cross join; exact-Jaccard "
        "verification joins only the candidate pairs.",
        explain_str(QUERIES["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001")),
    ))

    # 5. LSH-blocked near-dup (the scale path for embedding dedup)
    sections.append((
        "cosine_neardup_lsh (bucket-blocked pair join)",
        "MUST: the self-join key is (seed, bucket) — shuffle bounded by "
        "bucket population, no CartesianProduct anywhere; exact cosine "
        "evaluated on candidate pairs only.",
        explain_str(QUERIES["cosine_neardup_lsh"](spark, "/root/testdata/sf0.001")),
    ))

    # 6. multi-probe ANN top-k
    sections.append((
        "ann_lsh_topk (multi-probe bucket ball + TakeOrdered)",
        "MUST: bucket membership filter (IN probe-list) ahead of the "
        "scoring projection; global top-k via TakeOrderedAndProject "
        "(no full sort).  At scale `bucket` is the table's partition "
        "key, so the IN filter becomes partition pruning at the scan.",
        explain_str(QUERIES["ann_lsh_topk"](spark, "/root/testdata/sf0.001")),
    ))

    # 7. winnowing as pure DataFrame ops
    sections.append((
        "winnow_fingerprints (md5-slice + struct-min window, no Python)",
        "MUST: no Python UDF anywhere (BatchEvalPython/ArrowEvalPython "
        "absent); per-doc window partitions by doc — embarrassingly "
        "parallel across documents.",
        explain_str(QUERIES["winnow_fingerprints"](spark, "/root/testdata/sf0.001")),
    ))

    # 8. relational surface: broadcast join chain + top-k
    sections.append((
        "shipping_priority (TPC-H Q3 shape)",
        "MUST: BroadcastHashJoin chain (no SortMergeJoin at these dim "
        "sizes), PushedFilters on all three parquet scans (date/date/"
        "segment), global top-10 via TakeOrderedAndProject (no full "
        "sort), money aggregated as per-row cents in int64.",
        explain_str(QUERIES["shipping_priority"](spark, "/root/testdata/sf0.001")),
    ))

    # 9. decontamination: broadcast probe, corpus never shuffled pre-join
    sections.append((
        "decontaminate (broadcast benchmark-shingle probe)",
        "Witness: the corpus branch reaches the join with no KEY shuffle —\n"
        "FileScan → [gated fan-out: a RoundRobinPartitioning exchange that\n"
        "appears ONLY when the local file arrives as a single split; on a real\n"
        "multi-split table the gate is a no-op] → Generate (explode trigrams)\n"
        "→ BroadcastHashJoin(BuildRight = benchmark shingle set).  No\n"
        "HashPartitioning of the corpus anywhere before the probe.  The corpus\n"
        "shingle stream is deliberately NOT\n"
        "pre-deduplicated (`shingles(distinct=False)`): filter-then-distinct ≡\n"
        "distinct-then-filter for the hit count, and the former moves the\n"
        "(doc, shingle) dedup AFTER the probe, so the only KEY exchanges in the\n"
        "plan carry contaminated shingles only (partial distinct map-side\n"
        "first).  At 100 TB the corpus is streamed once; the benchmark set (an\n"
        "eval suite, MB-scale) is the broadcast build side.",
        explain_str(QUERIES["decontaminate"](spark, "/root/testdata/sf0.001")),
    ))

    # 10. connected components (pointer jumping, checkpointed sweeps)
    sections.append((
        "dedup_clusters (connected components, pointer jumping)",
        "Per sweep, three joins materialized by one eager localCheckpoint job:\n"
        "edges⋈labels (groupBy dst min, map-side combine) for the neighbour\n"
        "min, then labels self-joined on component for the pointer jump; the\n"
        "convergence probe is `sum(component)` over the checkpointed partitions\n"
        "(labels are monotone non-increasing, so an unchanged sum ⇔ fixed\n"
        "point) — no comparison join, no recompute (the count reads materialized\n"
        "partitions).  Sweeps are O(log diameter) by the doubling argument; the\n"
        "contract graph (diameter ~8) converges in 4 sweeps:",
        explain_str(QUERIES["dedup_clusters"](spark, "/root/testdata/sf0.001")),
    ))

    # 11. blocklist: corpus-side shuffle-freedom
    sections.append((
        "blocklist_filter (domain suffix match, corpus never shuffled)",
        "The 100 TB contract in hoststats.tag_blocked's docstring, witnessed:\n"
        "the corpus side reaches the output tag through BroadcastHashJoins only\n"
        "— the suffix explode (Generate over the higher-order suffix transform)\n"
        "is scan-local, the blocklist sits on the build side of the LeftSemi,\n"
        "and the only shuffle Exchange in the plan is the hash aggregate over\n"
        "the (tiny, block-rate-bounded) matched-id set, which is then broadcast\n"
        "back.  tests/test_blocklist.py::test_no_corpus_shuffle asserts this\n"
        "shape on every run.",
        explain_str(QUERIES["blocklist_filter"](spark, "/root/testdata/sf0.001")),
    ))

    # 12. TPC-H Q5 shape
    sections.append((
        "regional_revenue (TPC-H Q5 shape)",
        "Five-way join declared as plain `.join(...)`s: Catalyst puts region,\n"
        "nation, supplier, and customer on broadcast build sides (the region\n"
        "filter prunes the tree before any fact row moves) and AQE picks the\n"
        "orders⋈lineitem strategy from runtime sizes.  Both fact scans carry\n"
        "PushedFilters and pruned ReadSchema.",
        explain_str(QUERIES["regional_revenue"](spark, "/root/testdata/sf0.001")),
    ))

    # 13. incremental minhash probe (O(batch) signature work)
    sections.append((
        "dedup_incremental (LSH index probe, O(batch) signatures)",
        "MUST: probe and index band rows meet in ONE hash join keyed on\n"
        "(band, bsig) — no CartesianProduct; each side's 32-aggregate\n"
        "signature plan appears ONCE (single posexplode banding, sizes\n"
        "riding the band rows — a separate size aggregate or a union-arm\n"
        "banding would re-evaluate the whole aggregate); exact-Jaccard\n"
        "verification joins candidate pairs only.  At 100 TB the index\n"
        "side is a persisted bucketed table: only the incoming batch is\n"
        "shingled and hashed per snapshot.",
        explain_str(QUERIES["dedup_incremental"](spark, "/root/testdata/sf0.001")),
    ))

    # 14. substring scrub (positions kernel + interval merge)
    sections.append((
        "substring_scrub (winnow positions + gaps-and-islands merge)",
        "MUST: the linear mod-2^64 Arrow fingerprint pass (MapInPandas —\n"
        "never a per-row Python UDF) materializes ONCE: every consumer\n"
        "reads an InMemoryTableScan of the persisted picks frame (the\n"
        "MapInPandas text below repeats only inside the cached relation's\n"
        "description); the pair-qualification join is the capped\n"
        "inverted-index fp join (no all-pairs); the interval merge is ONE\n"
        "window over (doc, pos) — only (doc, fp, pos) triples move on a\n"
        "KEY shuffle; the sole exchange carrying text is the gated\n"
        "fan-out RoundRobin ahead of the Arrow pass (single-local-split\n"
        "only; a no-op on a real multi-split table).",
        explain_str(QUERIES["substring_scrub"](spark, "/root/testdata/sf0.001")),
    ))

    # 15. competitive LM language ID (train + score + argmax window)
    sections.append((
        "lang_id_lm (per-language bigram LM, train/score/argmax)",
        "MUST: fully JVM-side (no Python stage anywhere — the bigram\n"
        "explode is arrays_zip/slice codegen); ONE (lang,w1,w2) shuffle\n"
        "trains all language models together (no per-language pass); the\n"
        "scoring join keys (w1,w2) with fan-out bounded by\n"
        "langs-per-bigram; the winner pick is a per-doc window over\n"
        "n_langs rows, never a global sort.",
        explain_str(QUERIES["lang_id_lm"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "dedup_containment (one intersection row per unordered pair)",
        "MUST: exactly ONE posting-list self-join (SortMergeJoin on\n"
        "shingle) feeding ONE HashAggregate keyed (doc_lo, doc_hi) with\n"
        "doc_lo < doc_hi — the r3 kernel's a.doc != b.doc join\n"
        "materialized every intersection twice; both containment\n"
        "directions now come from a post-agg Generate (explode of two\n"
        "struct rows), so the pair shuffle is half and no second join\n"
        "or aggregate over postings appears anywhere in the plan.",
        explain_str(QUERIES["dedup_containment"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "bm25_topk (scan-side term filter, broadcast idf, top-k window)",
        "MUST: the query-term IN filter sits BELOW the first Exchange\n"
        "(tokens explode scan-local, non-matching terms never shuffle —\n"
        "for a q-term query at most q rows per doc move); the q-row idf\n"
        "table and the 1-row corpus stats reach the scoring join as\n"
        "BroadcastExchanges; the final rank is one window over matched\n"
        "docs only, never the corpus.",
        explain_str(QUERIES["bm25_topk"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "hybrid_rrf (rank fusion over two top-k lists)",
        "Witness: both retrieval arms end in their own bounded top-k\n"
        "(window rank <= 25) BEFORE the union — the fuse stage's inputs\n"
        "are k-row frames, so the grouped sum and final rank window cost\n"
        "O(k), independent of corpus size.  The BM25 arm keeps its\n"
        "scan-side term filter; the dense arm is the brute-topk scan\n"
        "(TakeOrderedAndProject) the ann_brute contract row pins.",
        explain_str(QUERIES["hybrid_rrf"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "domain_split (registrable-domain split, zero shuffle)",
        "MUST: NO Exchange anywhere — the PSL suffix pick, the md5\n"
        "bucket, and the cumulative-weight CASE chain are one scan-local\n"
        "projection; split assignment is a pure function of the domain\n"
        "string, so there is nothing to aggregate or join.",
        explain_str(QUERIES["domain_split"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "token_budget (histogram threshold, no global sort)",
        "MUST: the corpus is never globally sorted — the only wide\n"
        "corpus operation is the map-side-combined bin histogram\n"
        "(<=201 rows); the threshold window runs over that tiny frame\n"
        "and rejoins as a BroadcastExchange; the single-partition sort\n"
        "window touches only the boundary bin's docs, not the corpus.",
        explain_str(QUERIES["token_budget"](spark, "/root/testdata/sf0.001")),
    ))

    sections.append((
        "shard_shuffle (training-shard assignment, one shuffle)",
        "MUST: exactly ONE Exchange, hash-partitioned on the shard key\n"
        "— the same partitioning the shard writer needs, so the\n"
        "per-shard (bucket, id) sort feeds the write directly; no\n"
        "global sort, no driver collection.",
        explain_str(QUERIES["shard_shuffle"](spark, "/root/testdata/sf0.001")),
    ))

    out = ["# PLANS — formatted physical plans for the load-bearing shapes",
           "", "Generated by `python scripts/explain_plans.py`.", ""]
    for title, props, plan in sections:
        out += [f"## {title}", "", props, "", "```", plan, "```", ""]
    # hand-maintained witness sections (plans measured when each query
    # landed, with their MUST properties) live below the marker — carry
    # them over so a regeneration never destroys them
    marker = ("<!-- hand-maintained witnesses below: explain_plans.py "
              "preserves this tail on regeneration -->")
    path = os.path.join(REPO, "PLANS.md")
    tail = ""
    if os.path.exists(path):
        with open(path) as f:
            prev = f.read()
        if marker in prev:
            tail = prev[prev.index(marker):]
    with open(path, "w") as f:
        f.write("\n".join(out))
        if tail:
            f.write(tail)
    print(f"PLANS.md written ({len(sections)} generated sections"
          f"{' + hand tail' if tail else ''})")
    spark.stop()


if __name__ == "__main__":
    main()
