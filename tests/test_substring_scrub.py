"""Span scrubbing: the production end of exact-substring dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions import dedup
from crawler_spark.functions.textops import (
    _lower_keep_len,
    _winnow_picks_pos_vec64,
    _winnow_picks_vec64,
)

SHARED = "the quick brown fox jumps over the lazy dog while the band plays on"


def test_lower_keep_len_preserves_offsets():
    # U+0130 'İ' -> 'i̇' (2 chars) under str.lower(): the expanding char
    # must be kept as-is so every offset stays valid in the original
    s = "AİB"
    t = _lower_keep_len(s)
    assert len(t) == len(s)
    assert t[0] == "a" and t[2] == "b" and t[1] == "İ"
    assert _lower_keep_len("ABC def") == "abc def"
    assert _lower_keep_len("") == ""


def test_pos_kernel_non_ascii_offsets_stay_in_original():
    # four expanding chars up front: plain lower() would shift every
    # later pick by +4, past the original string's valid cut points
    s = "İİİİ " + SHARED
    picks = _winnow_picks_pos_vec64(s, 12, 4)
    assert picks  # the kernel must still fingerprint the shared tail
    for p, _ in picks:
        assert 0 <= p <= len(s) - 12


def test_scrub_non_ascii_prefix_cuts_the_right_chars(spark):
    # ADVICE r3 (medium): offsets were computed in the lowercased string
    # but cut the ORIGINAL; an expanding char before the duplicated span
    # made the cut land 1 char late per occurrence.
    prefix = "İİİİ turkish prefix here "
    df = spark.createDataFrame(
        [
            (1, "AAA " + SHARED + " BBB"),
            (2, prefix + SHARED + " tail words beyond"),
        ],
        "doc_id long, text string",
    )
    spans = dedup.substring_scrub_spans(df, k=12, w=4, min_shared=2, max_df=None)
    out = {
        r.doc_id: r.scrubbed
        for r in dedup.apply_scrub_spans(df, spans).collect()
    }
    assert SHARED not in out[2]
    assert out[2].startswith("İİİİ turkish prefix")  # prefix intact
    assert out[2].endswith("beyond")


def test_pos_kernel_values_match_value_kernel():
    for s in (SHARED, "short", "", "a" * 30, "x y z " * 40):
        vals = _winnow_picks_vec64(s, 12, 4)
        withpos = _winnow_picks_pos_vec64(s, 12, 4)
        assert [v for _, v in withpos] == vals
        poss = [p for p, _ in withpos]
        assert poss == sorted(set(poss))  # strictly increasing
        for p, v in withpos:
            assert 0 <= p <= max(len(s) - 12, 0)


def test_scrub_cuts_higher_id_copy_only(spark):
    df = spark.createDataFrame(
        [
            (1, "AAA " + SHARED + " BBB"),
            (2, "xxxx yyyy " + SHARED + " zzzz unrelated tail content here"),
            (3, "totally different text with no overlap at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    spans = dedup.substring_scrub_spans(df, k=12, w=4, min_shared=2, max_df=None)
    rows = spans.collect()
    assert {r.doc_id for r in rows} == {2}  # keep-first: doc 1 untouched
    out = {
        r.doc_id: r.scrubbed
        for r in dedup.apply_scrub_spans(df, spans).collect()
    }
    assert out[1] == "AAA " + SHARED + " BBB"
    assert out[3] == df.collect()[2].text
    assert SHARED not in out[2]
    assert out[2].startswith("xxxx") and out[2].endswith("here")


def test_scrub_merges_multiple_spans(spark):
    a = "first duplicated region with many stable words inside it"
    b = "second duplicated region also with many stable words here"
    df = spark.createDataFrame(
        [
            (1, a + " ||| " + b),
            (2, "P1 " + a + " MIDDLE-UNIQUE-SECTION-OF-THIS-DOC " + b + " P2"),
        ],
        "doc_id long, text string",
    )
    spans = dedup.substring_scrub_spans(df, k=12, w=4, min_shared=2, max_df=None)
    rows = sorted(spans.collect(), key=lambda r: r.span_start)
    assert all(r.doc_id == 2 for r in rows)
    assert len(rows) == 2  # the unique middle keeps the spans apart
    out = {
        r.doc_id: r.scrubbed
        for r in dedup.apply_scrub_spans(df, spans).collect()
    }
    assert "MIDDLE-UNIQUE" in out[2]
    assert a not in out[2] and b not in out[2]


def test_apply_scrub_offsets_stay_valid_right_to_left(spark):
    # two spans: cutting the left one first would shift the right one
    df = spark.createDataFrame([(1, "0123456789")], "doc_id long, text string")
    spans = spark.createDataFrame(
        [(1, 2, 4), (1, 7, 9)], "doc_id long, span_start long, span_end long"
    )
    out = dedup.apply_scrub_spans(df, spans).collect()[0].scrubbed
    # spans are 1-BASED, end exclusive: [2,4) cuts '12', [7,9) cuts '67'
    assert out == "034589"
