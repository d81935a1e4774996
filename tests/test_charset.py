"""P11 charset sniff kernel: BOM > meta prescan > UTF-8 default, byte
round-trip parity for the encodings the reference's DetermineEncoding
resolves deterministically."""

from __future__ import annotations

from crawler_spark.charset import sniff_charset, sniff_decode_py


def test_meta_prescan_variants():
    assert sniff_charset(b'<meta charset="GBK"><html>') == "gbk"
    assert sniff_charset(b"<meta charset=gb2312>") == "gb2312"
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" content="text/html; charset=big5">'
    ) == "big5"
    assert sniff_charset(b"<html>no declaration</html>") == "utf-8"
    # declaration outside the first 1 KiB is invisible, as in the reference
    assert sniff_charset(b"x" * 1024 + b'<meta charset="gbk">') == "utf-8"
    # unknown charset name falls through to utf-8
    assert sniff_charset(b'<meta charset="no-such-enc">') == "utf-8"


def test_meta_prescan_requires_meta_tag_context():
    """ADVICE r2: a bare 'charset=' outside a <meta> tag (URL query
    string, visible text) must not trigger a spurious transcode."""
    assert sniff_charset(b'<a href="/x?charset=gbk">link</a>') == "utf-8"
    assert sniff_charset(b"<p>set charset=big5 in your editor</p>") == "utf-8"
    # still detected inside a real meta tag, with other attrs in between
    assert (
        sniff_charset(b'<meta http-equiv="Content-Type" '
                      b'content="text/html; charset=gbk">')
        == "gbk"
    )
    # and the tag context cannot span a '>' into following text
    assert sniff_charset(b"<meta name=x> charset=gbk oops") == "utf-8"
    # r3 review: charset= inside an attribute VALUE (og:url query
    # string) is not attribute-position charset -> must not transcode
    assert (
        sniff_charset(b'<meta property="og:url" '
                      b'content="https://example.com/page?charset=big5">')
        == "utf-8"
    )
    # <metadata ...> is not a <meta> tag
    assert sniff_charset(b'<metadata charset="gbk">') == "utf-8"


def test_bom_strip_round_trip():
    s = "阳台 sun room"
    assert sniff_decode_py(b"\xef\xbb\xbf" + s.encode("utf-8")) == s
    assert sniff_decode_py(s.encode("utf-16")) == s  # FF FE BOM included


def test_gbk_round_trip():
    s = '<meta charset="GBK"><html>阳台朝南，采光很好</html>'
    assert sniff_decode_py(s.encode("gbk")) == s


def test_malformed_bytes_replace_not_raise():
    out = sniff_decode_py(b'<meta charset="gbk">\xff\xff\x81')
    assert "�" in out or out  # replacement, never an exception


def test_sniff_never_raises_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=2048))
    def run(raw):
        out = sniff_decode_py(raw)
        assert isinstance(out, str)

    run()


def test_parse_robots_never_raises_on_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_spark.politeness import parse_robots_py

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=2048))
    def run(txt):
        delay, prefixes = parse_robots_py(txt)
        assert delay is None or isinstance(delay, float)
        assert all(isinstance(p, str) and p for p in prefixes)

    run()
