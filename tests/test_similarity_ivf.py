"""IVF ANN: probing every cell must recover the exact brute-force
top-k (the approximation comes only from probing fewer cells)."""

from __future__ import annotations

from crawler_spark.functions import similarity

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_full_probe_equals_brute(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = list(emb.where("vec_id = 0").first().embedding)
    brute = [r.vec_id for r in
             similarity.brute_topk(emb, qv, k=10, exclude_id=0).collect()]
    ivf = [r.vec_id for r in
           similarity.ann_topk_ivf(
               emb, qv, k=10, n_centroids=8, n_probe=8, exclude_id=0
           ).collect()]
    assert ivf == brute


def test_ivf_partial_probe_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = list(emb.where("vec_id = 0").first().embedding)
    brute = {r.vec_id for r in
             similarity.brute_topk(emb, qv, k=10, exclude_id=0).collect()}
    ivf = {r.vec_id for r in
           similarity.ann_topk_ivf(
               emb, qv, k=10, n_centroids=8, n_probe=4, exclude_id=0
           ).collect()}
    # half the cells probed -> decent recall on smooth synthetic data
    assert len(ivf & brute) >= 5


def test_ivf_indexed_lifecycle_roundtrip(spark):
    """Train-once / probe-many: centroids persisted through a DataFrame
    round-trip + a cell-assigned table must serve queries identically to
    the self-contained path (same seed -> same quantizer)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = list(emb.where("vec_id = 0").first().embedding)
    C, assigned = similarity.ivf_build_index(emb, n_centroids=8, seed=42)
    # persist + reload the quantizer
    C2 = similarity.centroids_from_df(similarity.centroids_to_df(spark, C))
    assert (C == C2).all()
    # full probe == brute on the indexed path
    brute = [r.vec_id for r in
             similarity.brute_topk(emb, qv, k=10, exclude_id=0).collect()]
    idx_full = [r.vec_id for r in
                similarity.ann_topk_ivf_indexed(
                    assigned, C2, qv, k=10, n_probe=8, exclude_id=0
                ).collect()]
    assert idx_full == brute
    # pruned probe == the self-contained per-query-trained path
    per_query = [r.vec_id for r in
                 similarity.ann_topk_ivf(
                     emb, qv, k=10, n_centroids=8, n_probe=4, exclude_id=0
                 ).collect()]
    idx_pruned = [r.vec_id for r in
                  similarity.ann_topk_ivf_indexed(
                      assigned, C2, qv, k=10, n_probe=4, exclude_id=0
                  ).collect()]
    assert idx_pruned == per_query
