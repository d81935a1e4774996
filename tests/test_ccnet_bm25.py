"""CCNet perplexity bucketing + BM25 retrieval kernels.

Contract rows ccnet_buckets / bm25_topk hash these against DuckDB at
sf0.01 (test_entry_contract.py); these units pin the semantics on
hand-checkable corpora and the plan shapes that matter at scale.
"""
from pyspark.sql import functions as F

from crawler_spark.functions import textops


# ----------------------------------------------------- ccnet buckets
def test_ccnet_tercile_split_per_language(spark):
    # 6 docs per language -> exactly 2 per bucket; fluency ordered by
    # how repetitive the text is (self-trained LM loves repetition)
    rows = []
    for lang in ("en", "de"):
        for i in range(6):
            # doc i repeats a doc-specific pair i+1 times: higher i ->
            # higher conditional probabilities -> higher score
            rows.append((len(rows), lang, (f"w{lang}{i} x " * (i + 1)).strip()))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = textops.ccnet_perplexity_buckets(df).collect()
    assert len(out) == 12
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r.bucket] += 1
        assert counts == {"head": 2, "middle": 2, "tail": 2}
        # head docs strictly outscore tail docs
        head_min = min(r.lm_score_micro for r in rs if r.bucket == "head")
        tail_max = max(r.lm_score_micro for r in rs if r.bucket == "tail")
        assert head_min >= tail_max


def test_ccnet_single_doc_language_is_head(spark):
    df = spark.createDataFrame(
        [(1, "fr", "un deux trois"), (2, "en", "one two three"),
         (3, "en", "one two three four")],
        "doc_id long, lang string, text string",
    )
    out = {r.doc_id: r for r in textops.ccnet_perplexity_buckets(df).collect()}
    assert out[1].bucket == "head"  # rn=1, cnt=1 -> floor(0/1) = 0
    # zero-bigram docs are absent, not zero-scored
    empty = spark.createDataFrame(
        [(9, "en", "solo")], "doc_id long, lang string, text string"
    )
    assert textops.ccnet_perplexity_buckets(empty).count() == 0


# ------------------------------------------------------------- bm25
def test_bm25_ranks_matched_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark spark window filler words here"),
            (2, "spark window merge vector all four terms"),
            (3, "no matching terms in this one at all"),
            (4, "vector"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           textops.bm25_topk(df, ["spark", "window", "merge", "vector"], k=10)
           .collect()}
    assert 3 not in out  # no match -> no row
    assert out[2].n_terms == 4 and out[1].n_terms == 2
    # doc 2 matches all four terms and outranks the tf-heavy doc 1
    assert out[2].rank < out[1].rank
    assert all(r.score_milli > 0 for r in out.values())


def test_bm25_top_k_cut_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "common term text") for i in range(20)],
        "doc_id long, text string",
    )
    out = textops.bm25_topk(df, ["common"], k=5).collect()
    assert len(out) == 5
    # identical scores -> tie broken doc_id asc
    assert [r.doc_id for r in out] == [0, 1, 2, 3, 4]
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]


def test_bm25_term_filter_precedes_shuffle(spark):
    # the query-term isin filter must run scan-side: the exploded term
    # stream is filtered before the tf groupBy exchange, so the shuffle
    # carries at most |query| rows per doc at 100 TB
    df = spark.createDataFrame([(1, "a spark b")], "doc_id long, text string")
    plan = (
        textops.bm25_topk(df, ["spark"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" in plan
    # a Filter mentioning the term column appears below (after, in the
    # printed tree) the first Exchange — i.e. upstream of it
    below_first_exchange = plan[plan.find("Exchange"):]
    assert "Filter" in below_first_exchange and "spark" in below_first_exchange


def _bm25_reference(docs, terms, k1_micro=1_200_000, b_micro=750_000):
    """Independent pure-Python reimplementation of the milli fixed-point
    BM25 (follows the docstring formulas, not the Spark code)."""
    import re

    toks = {i: [t for t in re.split(r"[^a-z]+", txt.lower()) if t] for i, txt in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) // n
    dfc = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    scores = {}
    for i, t in toks.items():
        s = 0
        hit = 0
        for q in terms:
            tf = t.count(q)
            if not tf or not dfc[q]:
                continue
            hit += 1
            idf_milli = (2 * n - 2 * dfc[q] + 1) * 1000 // (2 * dfc[q] + 1)
            norm = (1_000_000 - b_micro) + b_micro * len(t) // avgdl
            denom = tf * 1_000_000 + k1_micro * norm // 1_000_000
            tfn_milli = tf * (k1_micro + 1_000_000) * 1000 // denom
            s += idf_milli * tfn_milli // 1000
        if hit:
            scores[i] = (s, hit)
    return scores


def test_bm25_matches_independent_reference(spark):
    import random

    rng = random.Random(7)
    vocab = ["spark", "window", "merge", "vector", "alpha", "beta", "gamma",
             "delta", "x1", "y2"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    terms = ["spark", "window", "merge", "vector"]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.score_milli, r.n_terms)
        for r in textops.bm25_topk(df, terms, k=60).collect()
    }
    ref = _bm25_reference(docs, terms)
    # top-60 over 60 docs = every matching doc; scores must be identical
    assert got == ref
