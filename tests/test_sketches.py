"""sketches.hll_distinct: duplicate-invariance (a sketch property,
not a sampling accident), per-key isolation, raw-estimator accuracy at
64 registers, and exact parity against a plain-Python md5 replay of
the register/rank/estimator arithmetic.
"""

from __future__ import annotations

import hashlib
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import sketches  # noqa: E402


def _py_hll(values):
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(h[:2], 16) % 64
        wh = h[2:8]
        lz = len(wh) - len(wh.lstrip("0"))
        d = wh[lz] if lz < 6 else "x"
        extra = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(
            d, 0
        )
        regs[reg] = max(regs.get(reg, 0), lz * 4 + extra + 1)
    s = sum(1 << (25 - regs.get(j, 0)) for j in range(64))
    return math.floor(709 * 64 * 64 * (1 << 25) / (1000 * s))


def _spark_hll(spark, rows):
    df = spark.createDataFrame(rows, "k long, v string")
    return {
        r["k"]: r["hll_est"]
        for r in sketches.hll_distinct(df, ["k"], "v").collect()
    }


def test_duplicates_do_not_move_the_estimate(spark):
    vals = [f"https://h0.example.com/p{i}" for i in range(200)]
    once = _spark_hll(spark, [(0, v) for v in vals])
    thrice = _spark_hll(spark, [(0, v) for v in vals * 3])
    assert once == thrice


def test_keys_are_isolated(spark):
    rows = [(0, f"u{i}") for i in range(300)] + [(1, f"u{i}") for i in range(8)]
    got = _spark_hll(spark, rows)
    assert got[0] == _py_hll([f"u{i}" for i in range(300)])
    assert got[1] == _py_hll([f"u{i}" for i in range(8)])


def test_raw_estimator_accuracy(spark):
    # 64 registers -> ~6.5% expected stderr; assert a generous 3-sigma
    # band for n in the raw estimator's working range.
    for n in (400, 1500):
        est = _spark_hll(spark, [(0, f"page-{i}") for i in range(n)])[0]
        assert abs(est - n) / n < 0.25, (n, est)


def test_randomized_parity(spark):
    rng = random.Random(707)
    for trial in range(3):
        n = rng.randint(5, 600)
        vals = [f"v{rng.randrange(10 * n)}" for _ in range(n)]
        assert _spark_hll(spark, [(0, v) for v in vals])[0] == _py_hll(
            vals
        ), f"t={trial}"


def test_register_merge_equals_direct(spark):
    # THE sketch property: register tables built on arbitrary shards
    # (here: overlapping ones) max-merge into exactly the whole-input
    # sketch — same registers, same estimate.
    from pyspark.sql import functions as F

    vals = [f"u{i}" for i in range(500)]
    rows = [(0, i % 3, v) for i, v in enumerate(vals)]
    # overlap: shard 9 repeats the first 100 values
    rows += [(0, 9, v) for v in vals[:100]]
    df = spark.createDataFrame(rows, "k long, shard int, v string")

    direct = sketches.hll_distinct(df.select("k", "v"), ["k"], "v")
    sharded = sketches.hll_registers(df, ["k", "shard"], "v")
    merged = sketches.hll_estimate(
        sharded.groupBy("k", "reg").agg(F.max("m").alias("m")), ["k"]
    )
    assert direct.collect()[0]["hll_est"] == merged.collect()[0]["hll_est"]
    assert direct.collect()[0]["hll_est"] == _py_hll(vals)
