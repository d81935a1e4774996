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


def simhash_md5_chunks_py(text: str) -> tuple[int, int, int, int]:
    """Python twin of dedup.simhash_md5_chunks for one doc."""
    import hashlib

    sums = [[0] * 16 for _ in range(4)]
    for tok in text.split(" "):
        hx = hashlib.md5(tok.encode("utf-8")).hexdigest()
        for c in range(4):
            v = int(hx[4 * c : 4 * c + 4], 16)
            for j in range(16):
                sums[c][j] += 1 if (v >> j) & 1 else -1
    return tuple(
        sum((1 << j) for j in range(16) if sums[c][j] > 0) for c in range(4)
    )


def test_simhash_md5_chunks_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r.doc: (r.ck_0, r.ck_1, r.ck_2, r.ck_3)
        for r in dedup.simhash_md5_chunks(df, "doc_id").collect()
    }
    want = {i: simhash_md5_chunks_py(t) for i, t in DOCS}
    assert got == want


def test_simhash_md5_near_pairs_blocking(spark):
    rows = [(0, "alpha beta gamma delta"), (1, "alpha beta gamma delta"),
            (2, "totally different words entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_md5_near_pairs(df, "doc_id", max_hamming=8).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert all(a == 0 and b == 1 for (a, b) in pairs)


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
