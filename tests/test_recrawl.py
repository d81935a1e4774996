"""recrawl_priority estimator semantics + host_reputation rollup."""
from pyspark.sql import functions as F

from crawler_spark.functions import hoststats, snapshots


def test_recrawl_priority_estimator(spark):
    # url 1: changed every visit; url 2: never changed; url 3: one obs.
    rows = (
        [(1, "a", e, 1) for e in range(1, 9)]
        + [(2, "a", e, 0) for e in range(1, 9)]
        + [(3, "b", 8, 1)]
    )
    hist = spark.createDataFrame(rows, "url_id int, host string, epoch int, changed int")
    out = {
        r.url_id: r
        for r in snapshots.recrawl_priority(hist, now_epoch=12).collect()
    }
    # hot page: 16*9//9 = 16
    assert out[1].interval == 16 and out[1].n_changes == 8
    # cold page: 16*9//1 = 144 -> clamped at 64
    assert out[2].interval == 64 and out[2].n_changes == 0
    # fresh page (1 obs, 1 change): 16*2//2 = 16, Laplace keeps it at base
    assert out[3].interval == 16 and out[3].n_obs == 1
    # overdue: hot page 4 epochs late on a 16 interval = 250000 micro
    assert out[1].overdue_micro == 250_000
    assert out[2].overdue_micro == 62_500  # 4e6 // 64


def test_host_reputation_rollup(spark):
    docs = spark.createDataFrame(
        [
            # host a: 2 unique + 1 dup (normalized), english-ish text
            (1, "a", "the quick brown fox is of the best and most fine"),
            (2, "a", "The  quick brown fox is of the best and most fine"),
            (3, "a", "zz yy xx ww vv uu tt ss rr qq"),
            # host b: 1 doc, non-english
            (4, "b", "zz yy xx ww vv uu tt ss rr qq pp oo"),
        ],
        "doc_id int, source string, text string",
    )
    out = {r.host: r for r in hoststats.host_reputation(docs).collect()}
    a = out["a"]
    # docs 1 and 2 normalize to the same fingerprint
    assert a.n_docs == 3 and a.n_unique_fp == 2
    assert a.dup_micro == 333_333
    assert a.en_micro == 666_666  # 2 of 3 pass the stopword gate
    b = out["b"]
    assert b.n_docs == 1 and b.dup_micro == 0 and b.en_micro == 0
    assert b.avg_tokens == 12
