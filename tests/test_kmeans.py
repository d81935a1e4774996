"""Fixed-point Lloyd's k-means (similarity.kmeans_fixed_point): unit
semantics + third-engine randomized parity (Spark integer kernel vs an
independent plain-Python Lloyd's — the DuckDB oracle is a THIRD
formulation, unrolled long-form CTEs, checked by the contract gate).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import similarity  # noqa: E402


def _py_kmeans(
    vecs: dict[int, list[float]],
    k: int,
    iterations: int,
    scale: int = 1000,
    cshift: int = 4,
) -> dict[int, int]:
    """Independent plain-Python fixed-point Lloyd's: same quantization
    contract (floor(x*scale); centroid grid (2**cshift * sum)//count;
    lowest-id tie-break), dict-and-loop formulation."""
    import math

    two = 1 << cshift
    pts = {
        i: [math.floor(float(x) * scale) for x in v] for i, v in vecs.items()
    }
    cents = {j: [two * x for x in pts[i]]
             for j, i in enumerate(sorted(pts)[:k])}
    assign: dict[int, int] = {}
    for it in range(iterations):
        assign = {}
        for i, xq in pts.items():
            best = min(
                (sum((two * x - m) ** 2 for x, m in zip(xq, mv)), j)
                for j, mv in cents.items()
            )
            assign[i] = best[1]
        if it == iterations - 1:
            break
        sums: dict[int, list[int]] = {}
        cnt: dict[int, int] = {}
        for i, j in assign.items():
            cnt[j] = cnt.get(j, 0) + 1
            s = sums.setdefault(j, [0] * len(pts[i]))
            for d, x in enumerate(pts[i]):
                s[d] += x
        cents = {
            j: [(two * s[d]) // cnt[j] for d in range(len(s))]
            for j, s in sums.items()
        }
    return assign


def _run_spark(spark, vecs: dict[int, list[float]], k: int, iters: int):
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.kmeans_fixed_point(df, k=k, iterations=iters)
    return {r.vec_id: r.cluster for r in out.collect()}


def test_kmeans_matches_python_reference_randomized(spark):
    rng = random.Random(421)
    for trial in range(3):
        n, dim, k = 60 + 30 * trial, 6, 4
        # three planted blobs + noise so clusters actually move between
        # iterations (assignment churn exercises the recompute path)
        vecs = {}
        for i in range(n):
            c = i % 3
            vecs[i] = [
                c * 0.7 + rng.uniform(-0.45, 0.45) for _ in range(dim)
            ]
        py = _py_kmeans(vecs, k, 3)
        sp = _run_spark(spark, vecs, k, 3)
        assert sp == py


def test_kmeans_single_iteration_is_seed_assignment(spark):
    rng = random.Random(7)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(4)] for i in range(25)}
    py = _py_kmeans(vecs, 3, 1)
    sp = _run_spark(spark, vecs, 3, 1)
    assert sp == py
    # iteration 1 uses the raw seed vectors: seeds assign to themselves
    for j in range(3):
        assert sp[j] == j


def test_kmeans_tie_breaks_to_lowest_cluster(spark):
    # two identical seed centroids -> every tied point must pick cluster 0
    vecs = {0: [1.0, 0.0], 1: [1.0, 0.0], 2: [1.0, 0.0], 3: [0.99, 0.01]}
    sp = _run_spark(spark, vecs, 2, 1)
    assert sp[2] == 0 and sp[0] == 0 and sp[1] == 0


def test_kmeans_empty_cluster_drops_out(spark):
    # seed 1 is a duplicate of seed 0 -> after recompute cluster 1 keeps
    # no members and must vanish (never re-seeded), deterministically
    vecs = {0: [0.0, 0.0], 1: [0.0, 0.0], 2: [5.0, 5.0], 3: [5.1, 5.0]}
    py = _py_kmeans(vecs, 2, 3)
    sp = _run_spark(spark, vecs, 2, 3)
    assert sp == py


def test_kmeans_negative_coordinate_floor_parity(spark):
    # negative coords: floor(-x*scale) and floor-division centroids are
    # where trunc-vs-floor engines diverge — pin the Python contract
    rng = random.Random(99)
    vecs = {i: [rng.uniform(-1, 0) for _ in range(5)] for i in range(40)}
    py = _py_kmeans(vecs, 4, 3)
    sp = _run_spark(spark, vecs, 4, 3)
    assert sp == py
