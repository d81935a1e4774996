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
