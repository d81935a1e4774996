"""Incremental cross-snapshot ops: minhash index probe + WARC revisits."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions import dedup, snapshots


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_flags_only_incoming_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    indexed = _mk_docs(spark, [(1, base), (2, "completely unrelated words here zebra")])
    incoming = _mk_docs(
        spark,
        [
            (10, base + " extra"),        # near-dup of 1
            (11, "nothing in common at all with any indexed text"),
        ],
    )
    out = dedup.minhash_probe_index(indexed, incoming, "doc_id").collect()
    assert len(out) == 1
    assert out[0].doc_id == 10 and out[0].match_id == 1
    assert out[0].jac_micro >= 500_000


def test_probe_picks_best_match_deterministically(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # two indexed docs: 2 is an exact dup (jac 1.0), 1 is a near-dup
    indexed = _mk_docs(spark, [(1, base + " tail"), (2, base)])
    incoming = _mk_docs(spark, [(5, base)])
    out = dedup.minhash_probe_index(indexed, incoming, "doc_id").collect()
    assert len(out) == 1
    assert out[0].match_id == 2 and out[0].jac_micro == 1_000_000


def test_probe_never_pairs_corpus_with_itself(spark):
    base = "one two three four five six seven eight nine ten"
    # indexed contains an internal dup pair (1, 2) — must NOT be reported
    indexed = _mk_docs(spark, [(1, base), (2, base)])
    incoming = _mk_docs(spark, [(5, "distinct payload with no overlap whatsoever")])
    assert dedup.minhash_probe_index(indexed, incoming, "doc_id").count() == 0


def test_revisit_records_classification(spark):
    fetches = spark.createDataFrame(
        [
            # url 1: content constant -> epoch 0 response, 1-2 revisits of 0
            (1, 0, "d0"), (1, 1, "d0"), (1, 2, "d0"),
            # url 2: changes at 1, reverts at 2 -> revisit points at epoch 0
            (2, 0, "a"), (2, 1, "b"), (2, 2, "a"),
        ],
        "url_id long, epoch long, digest string",
    )
    out = {
        (r.url_id, r.epoch): (r.record_type, r.refers_to_epoch)
        for r in snapshots.revisit_records(fetches).collect()
    }
    assert out[(1, 0)] == ("response", 0)
    assert out[(1, 1)] == ("revisit", 0)
    assert out[(1, 2)] == ("revisit", 0)
    assert out[(2, 0)] == ("response", 0)
    assert out[(2, 1)] == ("response", 1)
    assert out[(2, 2)] == ("revisit", 0)


def test_revisit_saved_bytes_rollup(spark):
    """The archival win: payload bytes are only stored for responses."""
    fetches = spark.createDataFrame(
        [(1, 0, "x", 100), (1, 1, "x", 100), (1, 2, "y", 120)],
        "url_id long, epoch long, digest string, length long",
    )
    out = snapshots.revisit_records(fetches)
    saved = out.where(F.col("record_type") == "revisit").agg(
        F.sum("length")
    ).collect()[0][0]
    assert saved == 100
