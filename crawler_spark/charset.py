"""P11 charset detect + transcode (SURVEY.md §2.3).

The reference sniffs the first 1024 bytes of every response and
transcodes to UTF-8 before parsing (/root/reference/collect/collect.go:
93-101 DeterminEncoding: Peek(1024) -> charset.DetermineEncoding ->
transform.NewReader; applied in BrowserFetch at collect.go:43-47,85-90).
Go's DetermineEncoding resolves, in order: BOM, an HTML <meta charset>
prescan, then a content heuristic.  This module implements the
deterministic core of that contract — BOM, then meta prescan over the
first 1 KiB, then UTF-8 — as a pure function shared by the engine's
Arrow-batched decode UDF and the pure-Python oracle, so both sides
transcode byte-identically (the invariant's hard requirement).

The content-heuristic tail (chardet-style frequency guessing for pages
that declare nothing) is intentionally NOT implemented: it is
probabilistic, the library is not in this sandbox, and a wrong guess
would silently break byte-identity.  Undeclared non-UTF-8 pages decode
with U+FFFD replacement instead — loud in diffs, never corrupting the
seen-set contract.
"""

from __future__ import annotations

import codecs
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# html5 meta prescan shapes: <meta charset="gbk"> and
# <meta http-equiv="Content-Type" content="text/html; charset=gbk">.
# Anchored to a <meta ...> tag context, and 'charset' must follow a
# whitespace/quote/';' delimiter: a bare 'charset=' in a URL query
# string or visible text (e.g. <meta property="og:url"
# content="...?charset=big5">) must NOT trigger a transcode (ADVICE r2
# + r3 review) — html5's prescan only honors attribute-position
# charset.  Heuristic, not a full attribute parser: a space-separated
# 'charset=' INSIDE a quoted attribute value would still match.
_META_RE = re.compile(
    rb"""<meta\s[^>]{0,512}?(?<=[\s"';])charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""",
    re.I,
)

SNIFF_BYTES = 1024  # reference Peek(1024), collect.go:94


def sniff_charset(head: bytes) -> str:
    """Charset name for a page prefix: BOM > meta prescan > utf-8."""
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if head.startswith(b"\xff\xfe") or head.startswith(b"\xfe\xff"):
        # 'utf-16' consumes the BOM during decode (Go's unicode.UTF16
        # BOMOverride does the same); the -le/-be names would leave a
        # stray U+FEFF at the start of the text
        return "utf-16"
    m = _META_RE.search(head[:SNIFF_BYTES])
    if m:
        enc = m.group(1).decode("ascii").lower()
        try:
            codecs.lookup(enc)
            return enc
        except LookupError:
            pass
    return "utf-8"


def sniff_decode_py(raw: bytes) -> str:
    """bytes -> str under the sniffed charset; malformed bytes decode
    with U+FFFD replacement (never an exception in the hot path)."""
    enc = sniff_charset(raw[:SNIFF_BYTES])
    try:
        return raw.decode(enc, errors="replace")
    except LookupError:  # pragma: no cover - sniff_charset validated it
        return raw.decode("utf-8", errors="replace")


def sniff_decode_col(col: Column) -> Column:
    """Arrow-batched decode UDF over raw page bytes — the engine's P11
    hot path when ``CrawlConfig.charset_sniff`` is on.  Python-side by
    necessity (JVM F.decode takes one fixed charset), but batched and
    only ever applied to the *scheduled* rows after the fetch join —
    never to the full corpus scan."""

    @F.pandas_udf("string")
    def _sniff(raw: pd.Series) -> pd.Series:
        return raw.map(
            lambda x: sniff_decode_py(bytes(x)) if x is not None else None
        )

    return _sniff(col)
