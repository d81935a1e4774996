"""ANN-LSH multi-probe recall + LSH-blocked near-dup completeness.

VERDICT r1 flagged single-probe LSH returning 3 rows for k=10 (recall
0.3) and the scored near-dup path being an O(n^2) crossJoin.  These
tests pin the fixes:

- multi-probe top-k always returns k rows and meets a measured recall
  bar vs brute force (1.0 at sf0.01 -- which is what licenses the
  brute-force SQL as an exact oracle in the driver contract -- and
  >= 0.9 at sf0.1 on this near-uniform corpus);
- the LSH-bucket-blocked near-dup equals the exact kernel (recall 1.0)
  over the twin-planted corpus at both scales.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.entry_queries import _emb, _emb_with_twins, _query_vec
from crawler_spark.functions import similarity

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF001), reason="driver testdata not present"
)


def _brute_ids(spark, sf_dir, k=10):
    qv = _query_vec(spark, sf_dir)
    return [
        r.vec_id
        for r in similarity.brute_topk(_emb(spark, sf_dir), qv, k=k, exclude_id=0)
        .select("vec_id").collect()
    ]


def _lsh_ids(spark, sf_dir, k=10, **kw):
    qv = _query_vec(spark, sf_dir)
    return [
        r.vec_id
        for r in similarity.ann_topk_lsh(
            _emb(spark, sf_dir), qv, k=k, exclude_id=0, **kw
        ).select("vec_id").collect()
    ]


@needs_testdata
def test_multiprobe_fills_k_and_exact_at_contract_sf(spark):
    brute = _brute_ids(spark, SF001)
    lsh = _lsh_ids(spark, SF001, n_planes=8, max_hamming=4)
    assert len(lsh) == 10  # the r1 bug: single-probe returned 3 rows
    # exact equality (not just set recall) is what licenses the
    # brute-force SQL oracle for ann_lsh_topk in the driver contract
    assert lsh == brute


@needs_testdata
@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 not present")
def test_multiprobe_recall_at_sf01(spark):
    brute = _brute_ids(spark, SF01)
    lsh = _lsh_ids(spark, SF01, n_planes=8, max_hamming=4)
    assert len(lsh) == 10
    recall = len(set(lsh) & set(brute)) / 10
    assert recall >= 0.9


def test_lsh_prunes_on_clustered_corpus(spark):
    """VERDICT r2 #7: on the near-uniform driver corpus a recall-1.0
    probe ball covers ~64% of buckets, so the pruning win is invisible.
    On a CLUSTERED corpus (the realistic embedding shape, via the
    corpus knob) a small ball must reach recall >=0.9 while probing
    <10% of the buckets AND scoring <15% of the corpus — i.e. the
    bucket pruning actually prunes."""
    from crawler_spark.corpus import clustered_embeddings
    from crawler_spark.functions.similarity import (
        _planes, lsh_bucket_col, multiprobe_buckets,
    )

    n_planes, max_h, k = 8, 1, 10
    emb = clustered_embeddings(
        spark, n_clusters=20, per_cluster=100, dim=32, spread=0.15
    ).persist()
    qv = list(emb.where(F.col("vec_id") == 0).first().embedding)

    brute = [
        r.vec_id
        for r in similarity.brute_topk(emb, qv, k=k, exclude_id=0).collect()
    ]
    lsh = [
        r.vec_id
        for r in similarity.ann_topk_lsh(
            emb, qv, k=k, exclude_id=0, n_planes=n_planes, max_hamming=max_h
        ).collect()
    ]
    recall = len(set(lsh) & set(brute)) / k
    assert recall >= 0.9, recall

    # selectivity: the measured pruning pair the VERDICT asked for
    probes = multiprobe_buckets(qv, _planes(n_planes, 32), max_h)
    bucket_frac = len(probes) / (1 << n_planes)
    assert bucket_frac < 0.10, bucket_frac  # 9/256 ~ 3.5%
    bucketed = emb.withColumn("bucket", lsh_bucket_col("embedding", _planes(n_planes, 32)))
    scored = bucketed.where(F.col("bucket").isin(probes)).count()
    corpus_frac = scored / emb.count()
    assert corpus_frac < 0.15, corpus_frac
    emb.unpersist()


def test_knn_join_lsh_recall_on_clustered_corpus(spark):
    """Bucket-pruned batch k-NN (the no-broadcast scale path): on the
    clustered corpus, per-query recall vs the exact knn_join must
    average >=0.9 with a 1-flip ball, while each query scores only a
    small corpus fraction."""
    from crawler_spark.corpus import clustered_embeddings

    emb = clustered_embeddings(
        spark, n_clusters=20, per_cluster=100, dim=32, spread=0.15
    ).persist()
    queries = emb.where(F.col("vec_id") % 100 == 0)  # one per cluster

    exact = {}
    for r in similarity.knn_join(emb, queries, k=5).collect():
        exact.setdefault(r.q_id, set()).add(r.vec_id)
    approx = {}
    for r in similarity.knn_join_lsh(
        emb, queries, k=5, n_planes=8, max_hamming=1
    ).collect():
        approx.setdefault(r.q_id, set()).add(r.vec_id)

    recalls = [
        len(approx.get(q, set()) & hits) / len(hits) for q, hits in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.9, sum(recalls) / len(recalls)

    # selectivity: candidate pairs ≪ full cross product
    from crawler_spark.functions.similarity import (
        _planes, lsh_bucket_col, probe_buckets_col,
    )

    P = _planes(8, 32)
    qb = queries.select("vec_id", "embedding").withColumn(
        "bucket", F.explode(probe_buckets_col("embedding", P, 1))
    )
    cb = emb.withColumn("bucket", lsh_bucket_col("embedding", P))
    n_cand = qb.join(cb.select("bucket"), "bucket").count()
    n_full = queries.count() * emb.count()
    assert n_cand / n_full < 0.15, n_cand / n_full
    emb.unpersist()


def test_ivf_indexed_prunes_on_clustered_corpus(spark):
    """Train-once IVF lifecycle on the clustered corpus: with centroids
    ~ clusters and a 2-of-20-cell probe (10%), recall vs brute must be
    >=0.9 while the probed cells hold a small corpus fraction."""
    from crawler_spark.corpus import clustered_embeddings

    emb = clustered_embeddings(
        spark, n_clusters=20, per_cluster=100, dim=32, spread=0.15
    ).persist()
    C, assigned = similarity.ivf_build_index(emb, n_centroids=20, n_iter=2)
    assigned = assigned.persist()
    qv = list(emb.where(F.col("vec_id") == 0).first().embedding)

    brute = [
        r.vec_id
        for r in similarity.brute_topk(emb, qv, k=10, exclude_id=0).collect()
    ]
    got = [
        r.vec_id
        for r in similarity.ann_topk_ivf_indexed(
            assigned, C, qv, k=10, n_probe=2, exclude_id=0
        ).collect()
    ]
    recall = len(set(got) & set(brute)) / 10
    assert recall >= 0.9, recall

    import numpy as np

    probe_frac = 2 / 20
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    qn = np.asarray(qv) / np.linalg.norm(qv)
    probe = np.argsort(-(Cn @ qn))[:2].tolist()
    scanned = assigned.where(F.col("cell").isin(probe)).count()
    corpus_frac = scanned / emb.count()
    assert corpus_frac < 0.25, (probe_frac, corpus_frac)
    emb.unpersist()
    assigned.unpersist()


@needs_testdata
def test_single_probe_underfills_documented(spark):
    """The r1 failure mode, kept as a negative witness: a Hamming-0
    probe over 8 planes cannot fill k=10 from ~500/256 vectors/bucket."""
    lsh = _lsh_ids(spark, SF001, n_planes=8, max_hamming=0)
    assert len(lsh) < 10


@needs_testdata
@pytest.mark.parametrize("sf_dir", [SF001, SF01], ids=["sf0.01", "sf0.1"])
def test_neardup_lsh_equals_exact_on_twins(spark, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata scale not present")
    allv = _emb_with_twins(spark, sf_dir)
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_pairs_exact(
            allv, threshold_micro=900_000, vec_col="v"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_pairs_lsh(
            allv, dim=64, threshold_micro=900_000, vec_col="v",
            n_planes=6, seeds=(42, 43, 44),
        ).collect()
    }
    assert exact, "twin planting produced no near-dup pairs"
    assert lsh == exact  # blocking missed nothing; verification exact
    # every planted twin is recovered
    n = _emb(spark, sf_dir).count()
    planted = {(i, i + 1_000_000) for i in range(0, n, 5)}
    assert planted <= exact


@needs_testdata
def test_knn_join_matches_per_query_brute(spark):
    """The batched one-pass k-NN join must equal running brute_topk once
    per query (validates the partition-top-k -> global-prune merge)."""
    emb = _emb(spark, SF001).repartition(7)  # force multi-partition merge
    queries = emb.where(F.col("vec_id") % 100 == 0)
    got = {}
    for r in similarity.knn_join(emb, queries, k=5).collect():
        got.setdefault(r.q_id, []).append((r.rank, r.vec_id))
    for q in [r.vec_id for r in queries.select("vec_id").collect()]:
        qv = list(emb.where(F.col("vec_id") == q).first().embedding)
        brute = [
            r.vec_id
            for r in similarity.brute_topk(emb, qv, k=5, exclude_id=q).collect()
        ]
        assert [v for _, v in sorted(got[q])] == brute, q


def test_broadcast_ceilings_fail_loudly(spark, monkeypatch):
    """Past the broadcast ceiling the matrix kernels must raise with the
    scale-path alternative named, never attempt the collect."""
    import pytest as _pytest

    emb = _emb(spark, SF001)
    monkeypatch.setattr(similarity, "MAX_BROADCAST_VECTORS", 10)
    with _pytest.raises(ValueError, match="cosine_neardup_pairs_lsh"):
        similarity.cosine_neardup_pairs_exact(emb, threshold_micro=900_000)
    with _pytest.raises(ValueError, match="chunk the query set"):
        similarity.knn_join(emb, emb, k=3)
