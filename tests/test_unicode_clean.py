"""Unit tests for textops.normalize_unicode_col / unicode_clean —
each transformation class, ordering (\\x0B dies before \\s+ runs),
idempotence, and the zero-shuffle plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import textops  # noqa: E402


def _clean(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = textops.unicode_clean(df)
    return [r["text"] for r in out.orderBy("doc_id").collect()]


def test_typographic_map_and_invisibles(spark):
    got = _clean(
        spark,
        [
            "don’t “stop”",
            "a b c　d",
            "en–em—bar―",
            "wait… what",
            "zero​width‌join‍er﻿bom",
            "soft­hyphen",
        ],
    )
    assert got[0] == "don't \"stop\""
    assert got[1] == "a b c d"
    assert got[2] == "en-em-bar-"
    assert got[3] == "wait... what"
    assert got[4] == "zerowidthjoinerbom"
    assert got[5] == "softhyphen"


def test_controls_then_whitespace_collapse(spark):
    # \x0B (vertical tab) is in Java's \s but NOT RE2's — the kernel
    # converts it to a plain space in step 4, so step 5's \s+ behaves
    # identically in both engines.  DEL and C0 die too; tab/LF/CR are
    # ordinary whitespace and collapse.
    got = _clean(
        spark,
        [
            "a\x00b\x08c\x0bd\x0ce\x1ff\x7fg",
            "  spaced\t\tout\n\nlines\r\r  ",
        ],
    )
    assert got[0] == "a b c d e f g"
    assert got[1] == "spaced out lines"


def test_idempotent(spark):
    dirty = "don’t “stop”… now\x0b!"
    once = _clean(spark, [dirty])[0]
    twice = _clean(spark, [once])[0]
    assert once == twice == "don't \"stop\"... now !"


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = textops.unicode_clean(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def _py_reference(s):
    """Independent third-engine reference (Python re with ASCII \\s,
    matching Java/RE2 semantics after the control sweep)."""
    import re
    s = re.sub("[​‌‍﻿­]", "", s)
    s = s.translate(str.maketrans(
        "  　‘’“”–—―",
        "   ''\"\"---"))
    s = s.replace("…", "...")
    s = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " ", s)
    return re.sub(r"\s+", " ", s, flags=re.ASCII).strip()


def test_randomized_parity_with_python_reference(spark):
    # 300 seeded-random strings over ASCII + every mapped special +
    # arbitrary BMP letters: Spark output must equal the independent
    # Python implementation AND be idempotent.
    import random
    rng = random.Random(20260819)
    specials = ("​‌‍﻿­  　"
                "‘’“”–—―…"
                "\x01\x0b\x7f\t\n")
    pool = ("abc XYZ 123 .,!?" + specials
            + "é中文नमсло")
    texts = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    got = _clean(spark, texts)
    for raw, out in zip(texts, got):
        assert out == _py_reference(raw), repr(raw)
    got2 = _clean(spark, got)
    assert got2 == got
