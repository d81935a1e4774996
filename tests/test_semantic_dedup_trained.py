"""SemDeDup with trained clusters (similarity.semantic_pairs_within
over kmeans_fixed_point assignments): third-engine randomized parity —
Spark pipeline vs an independent plain-Python Lloyd's + cosine pair
scan.  The DuckDB oracle (Lloyd CTE replay + unit-normalized pair dot)
is the second engine, checked by the contract gate.
"""

from __future__ import annotations

import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import similarity  # noqa: E402
from tests.test_kmeans import _py_kmeans  # noqa: E402


def _py_pairs(vecs, assign, thresh_micro):
    unit = {}
    for i, v in vecs.items():
        dv = [float(x) for x in v]
        n = math.sqrt(sum(x * x for x in dv))
        unit[i] = [x / n for x in dv]
    out = []
    ids = sorted(vecs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if assign[a] != assign[b]:
                continue
            # left-fold dot in array order, same as Spark's aggregate
            cos = math.floor(
                sum(x * y for x, y in zip(unit[a], unit[b])) * 1_000_000
            )
            if cos >= thresh_micro:
                out.append((assign[a], a, b, cos))
    return sorted(out)


def test_trained_semdedup_matches_python_reference(spark):
    rng = random.Random(777)
    # planted near-dup twins inside blobs: doc 2i+1 is a tiny
    # perturbation of doc 2i, so within-cluster pairs actually fire.
    # Coordinates are snapped to 1/128 steps (dyadic rationals, exactly
    # representable in float32) so the python-double reference and the
    # Spark float32 column quantize identically at the floor(x*1000)
    # grid — without the snap, f32 rounding near a millesimal boundary
    # could legitimately flip a quantized cell.
    def dy(x: float) -> float:
        return round(x * 128) / 128

    vecs = {}
    for i in range(40):
        base = [dy((i % 4) * 0.8 + rng.uniform(-0.3, 0.3)) for _ in range(6)]
        vecs[2 * i] = base
        vecs[2 * i + 1] = [dy(x + rng.choice((-1, 1)) / 128) for x in base]
    k, iters, thresh = 4, 3, 900_000

    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assign_df = similarity.kmeans_fixed_point(df, k=k, iterations=iters)
    got = sorted(
        (r.cluster, r.id_a, r.id_b, r.cos_micro)
        for r in similarity.semantic_pairs_within(
            df, assign_df, thresh_micro=thresh
        ).collect()
    )

    # independent python: quantize exactly as the kernel (floor(f32*1000))
    qvecs = {i: [float(x) for x in v] for i, v in vecs.items()}
    assign = _py_kmeans(qvecs, k, iters)
    exp = _py_pairs(vecs, assign, thresh)
    assert got == exp
    assert len(got) > 0  # the planted twins must surface
    # every pair is within one cluster by construction of the kernel
    assert all(assign[a] == assign[b] == c for c, a, b, _ in got)
