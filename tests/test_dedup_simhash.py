"""JVM SimHash (explode + xxhash64 + bit sums) must be bit-identical to
the pure-Python reference ``simhash_py`` — same XXH64 seed-42 token
hashes, same Python-split(' ') token semantics, same >0 tie rule."""

from __future__ import annotations

from crawler_spark.functions import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, ""),
    (3, "single"),
    (4, "a  b"),  # consecutive spaces -> empty token, kept by split(' ')
    (5, "unicode 阳台 朝南 テスト"),
    (6, "trailing space "),
    (7, " leading"),
    (8, "repeat repeat repeat repeat"),
]


def test_simhash_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc: r.simhash for r in dedup.simhash(df, "doc_id").collect()}
    want = {i: dedup.simhash_py(t.split(" ")) for i, t in DOCS}
    assert got == want


def test_simhash_near_pairs_blocking(spark):
    """Identical docs -> hamming 0; the banded join must surface them."""
    rows = [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "totally different words entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_pairs(df, "doc_id", max_hamming=3).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert all(a == 0 and b == 1 for (a, b) in pairs)
