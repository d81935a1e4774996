"""Mixed-script contract slice (VERDICT r4 "What's missing" #1): prove
the inputs of the *_mixed contract rows really contain multi-byte text,
and pin the per-char lowercase parity the scrub oracle relies on.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark import entry_queries as eq  # noqa: E402
from crawler_spark.functions.textops import _lower_keep_len  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def _all_mixed_texts() -> list[str]:
    texts = []
    for i in range(64):
        tpl = eq._MIX_SLICES[i % 8]
        t = tpl.replace("{i}", str(i))
        if i % 4 == 0:
            t += eq._MIX_PASSAGE.replace("{g}", str(i // 40))
        texts.append(t)
    return texts


def test_corpus_provably_multibyte():
    """The input of every *_mixed row contains: >0x7F chars (multi-byte
    UTF-8), an astral-plane char (>0xFFFF), the expanding-case U+0130,
    curly punctuation, and CJK/Cyrillic/Arabic — the exact classes the
    r4 contract corpus lacked."""
    blob = "".join(_all_mixed_texts())
    cps = {ord(c) for c in blob}
    assert any(c > 0x7F for c in cps), "no multi-byte chars"
    assert any(c > 0xFFFF for c in cps), "no astral chars"
    assert 0x0130 in cps, "no expanding-case U+0130"
    assert 0x201C in cps and 0x2014 in cps, "no curly punctuation"
    assert any(0x4E00 <= c <= 0x9FFF for c in cps), "no CJK"
    assert any(0x0400 <= c <= 0x04FF for c in cps), "no Cyrillic"
    assert any(0x0600 <= c <= 0x06FF for c in cps), "no Arabic"


def test_spark_side_synthesis_is_multibyte(spark):
    """Same check against the ACTUAL Spark-side synthesized column (not
    just the templates), so a regression in _mixed_text_col cannot
    silently drop the multi-byte slices."""
    rows = eq._mixed_docs(spark, SF_DIR).limit(64).collect()
    blob = "".join(r["text"] for r in rows)
    assert any(ord(c) > 0xFFFF for c in blob)
    assert "İ" in blob
    assert any(0x4E00 <= ord(c) <= 0x9FFF for c in blob)


def test_scrub_oracle_per_char_lower_parity():
    """The mixed scrub oracle hashes
    case when unicode(ch)=304 then 304 else unicode(lower(ch)) end;
    the production kernel hashes ord(_lower_keep_len(ch)).  Assert the
    two agree for EVERY distinct char in the mixed corpus (U+0130 is
    the only Python-expanding code point; everything else must lower
    identically in DuckDB and Python)."""
    con = duckdb.connect()
    chars = sorted(set("".join(_all_mixed_texts())))
    for c in chars:
        expected = ord(_lower_keep_len(c))
        got = con.execute(
            "select case when unicode(?) = 304 then 304 "
            "else unicode(lower(?)) end", [c, c]
        ).fetchone()[0]
        assert got == expected, (c, hex(ord(c)), got, expected)


def test_scrub_mixed_spans_land_on_passage(spark):
    """Every passage-sharing doc except the globally lowest one must
    get a span that OVERLAPS the planted passage region, at multi-byte
    code-point offsets.  (Spans outside the passage are legitimate too:
    slice templates share constant runs across docs, and a qualified
    pair scrubs ALL its shared material — the oracle replays that; this
    test pins the passage-location behavior specifically.)"""
    spans: dict[int, list[tuple[int, int]]] = {}
    for r in eq.QUERIES["scrub_mixed"](spark, SF_DIR).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert spans, "no spans found on the mixed corpus"
    docs = {r["doc_id"]: r["text"]
            for r in eq._mixed_docs(spark, SF_DIR).collect()}
    sharers = sorted(d for d in docs if d % 4 == 0)
    keeper = sharers[0]
    assert keeper not in spans, f"global keeper {keeper} was scrubbed"
    for d in sharers[1:]:
        assert d in spans, f"doc {d} shares the passage but got no span"
        passage_start = len(docs[d]) - len(
            eq._MIX_PASSAGE.replace("{g}", str(d // 40))
        ) + 1  # 1-based
        # at least one span must overlap the passage region, and no
        # span may extend past the end of the doc (offset sanity on
        # multi-byte text)
        assert any(e > passage_start for _, e in spans[d]), (d, spans[d])
        assert all(e <= len(docs[d]) + 1 for _, e in spans[d]), (d, spans[d])
