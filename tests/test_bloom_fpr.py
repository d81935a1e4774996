"""seen.bloom_fpr_stats: the no-false-negative guarantee (probing the
member set itself hits every time), plus exact parity against a
plain-Python md5 replay of positions, saturation and the analytic
expectation.
"""

from __future__ import annotations

import hashlib
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark import seen  # noqa: E402


def _positions(key, m, k):
    h = hashlib.md5(key.encode()).hexdigest()
    return {int(h[3 * i: 3 * i + 3], 16) % m for i in range(k)}


def _py_stats(members, probes, m=2048, k=4):
    bits = set()
    for key in members:
        bits |= _positions(key, m, k)
    nfp = sum(1 for p in probes if _positions(p, m, k) <= bits)
    return {
        "n_members": len(members),
        "bits_set": len(bits),
        "n_probes": len(probes),
        "n_false_pos": nfp,
        "fpr_milli": math.floor(nfp * 1000 / len(probes)),
        "expected_fpr_milli": math.floor(
            len(bits) ** 4 * 1000 / m ** 4
        ),
    }


def _spark_stats(spark, members, probes):
    mdf = spark.createDataFrame([(x,) for x in members], "key string")
    pdf = spark.createDataFrame([(x,) for x in probes], "key string")
    return seen.bloom_fpr_stats(mdf, pdf, "key").collect()[0].asDict()


def test_members_never_miss(spark):
    members = [f"u{i}" for i in range(120)]
    got = _spark_stats(spark, members, members)
    # probing the member set: every probe hits all its own positions
    assert got["n_false_pos"] == got["n_probes"] == 120


def test_randomized_parity(spark):
    rng = random.Random(909)
    for trial in range(3):
        nm = rng.randint(20, 400)
        members = [f"m{rng.randrange(10**6)}" for _ in range(nm)]
        probes = sorted({f"p{rng.randrange(10**6)}" for _ in range(nm)})
        assert _spark_stats(spark, sorted(set(members)), probes) == _py_stats(
            sorted(set(members)), probes
        ), f"t={trial}"
