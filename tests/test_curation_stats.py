"""Unit tests for the late-r4 curation-stat kernels: URL-shape
features (urlfeat.url_features), link-farm detection
(graph.link_spam_stats), and vocabulary stats (textops.vocab_stats).
Contract-level oracle equivalence is covered by test_entry_contract;
these pin the hand-checkable edge cases."""

from __future__ import annotations

from crawler_spark.functions import graph, textops, urlfeat


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


def test_url_features_clean_url(spark):
    df = spark.createDataFrame(
        [("https://www.news.example.com/articles/item7",)], ["url"]
    )
    r = urlfeat.url_features(df).collect()[0]
    assert r.url_len == len("https://www.news.example.com/articles/item7")
    assert r.path_depth == 2
    assert r.n_query_params == 0  # no '?': empty query, not 1 param
    assert r.pct_encoded == 0
    assert r.n_subdomains == 2  # www.news + example + com -> 3 dots - 1
    assert not r.url_spam


def test_url_features_spam_axes(spark):
    df = spark.createDataFrame(
        [
            # parameter farm: 4 params > 3
            ("params", "https://a.com/x?sid=1&ref=2&a=3&b=4"),
            # calendar depth: 9 segments > 8
            ("depth", "https://a.com/a/b/c/d/e/f/g/h/i"),
            # digit soup: > 30% digits
            ("digits", "https://a.com/1234567890123456789"),
            # long: > 120 chars
            ("long", "https://a.com/" + "x" * 120),
            # percent-encoding counted but not spam by itself
            ("enc", "https://a.com/p%20q%3Dr"),
        ],
        ["name", "url"],
    )
    got = _rows(urlfeat.url_features(df), "name")
    assert got["params"]["n_query_params"] == 4 and got["params"]["url_spam"]
    assert got["depth"]["path_depth"] == 9 and got["depth"]["url_spam"]
    assert got["digits"]["url_spam"]
    assert got["long"]["url_spam"]
    assert got["enc"]["pct_encoded"] == 2 and not got["enc"]["url_spam"]


def test_url_features_dotless_host_floor(spark):
    df = spark.createDataFrame([("https://localhost/x",)], ["url"])
    r = urlfeat.url_features(df).collect()[0]
    assert r.n_subdomains == 0  # greatest(-1, 0)


def test_link_spam_stats_hand_graph(spark):
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),        # reciprocal pair
            ("a", "c"),                     # one-way
            ("a", "b"),                     # duplicate: collapses
            ("d", "d"),                     # self-edge: dropped
            ("c", "a"),                     # makes a->c reciprocal too
        ],
        ["src", "dst"],
    )
    got = _rows(graph.link_spam_stats(edges), "host")
    assert got["a"]["outdeg"] == 2 and got["a"]["n_recip"] == 2
    assert got["a"]["recip_ppm"] == 1_000_000 and got["a"]["link_farm"]
    # b: outdeg 1 -> fully reciprocal but below min_outdeg
    assert got["b"]["outdeg"] == 1 and got["b"]["recip_ppm"] == 1_000_000
    assert not got["b"]["link_farm"]
    assert "d" not in got  # only a self-edge: no qualifying outlinks


def test_vocab_stats_counts(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "a a b"),
            ("s1", "b  c"),  # double space: empty token filtered
            ("s2", "z"),
        ],
        ["source", "text"],
    )
    got = _rows(textops.vocab_stats(docs), "source")
    s1 = got["s1"]
    assert s1["n_tokens"] == 5 and s1["n_types"] == 3 and s1["n_hapax"] == 1
    assert s1["ttr_ppm"] == 600_000            # floor(3e6/5)
    assert s1["hapax_ppm"] == 333_333          # floor(1e6/3)
    s2 = got["s2"]
    assert s2["n_tokens"] == 1 and s2["n_types"] == 1 and s2["n_hapax"] == 1
    assert s2["ttr_ppm"] == 1_000_000 and s2["hapax_ppm"] == 1_000_000


def test_readability_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello world. It is fun."),
            (2, "abc"),      # no punctuation: sentence floor at 1
            (3, ""),         # empty: word guard at 1, zero syllables
        ],
        ["doc_id", "text"],
    )
    got = _rows(textops.readability_scores(docs), "doc_id")
    r = got[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 6)
    # floor(390*5/2 + 11800*6/5 - 15590) = floor(-455.0)
    assert r["fk_grade_milli"] == -455
    # floor(206835 - 1015*5/2 - 84600*6/5) = floor(102777.5)
    assert r["reading_ease_milli"] == 102777
    assert got[2]["n_sentences"] == 1 and got[2]["n_syllables"] == 1
    assert got[3]["n_words"] == 0 and got[3]["fk_grade_milli"] == -15200


def test_url_param_dedup_collapse(spark):
    from crawler_spark.functions import urlfeat

    urls = spark.createDataFrame(
        [
            (1, "https://a.com/p?utm_source=x&id=1"),
            (2, "https://a.com/p?id=1&gclid=g9"),
            (3, "https://a.com/p?id=1"),
            (4, "https://a.com/q?b=2&a=1"),
            (5, "https://a.com/q?a=1&b=2"),   # order-only variant
            (6, "https://a.com/r?utm_only=x"),  # all params stripped
        ],
        ["doc_id", "url"],
    )
    got = _rows(urlfeat.url_param_dedup(urls), "url_canon")
    g = got["https://a.com/p?id=1"]
    assert g["n_urls"] == 3 and g["n_distinct_raw"] == 3 and g["keep_id"] == 1
    q = got["https://a.com/q?a=1&b=2"]
    assert q["n_urls"] == 2 and q["n_distinct_raw"] == 2 and q["keep_id"] == 4
    assert got["https://a.com/r"]["n_urls"] == 1  # bare base: no '?'


def test_canonical_url_python_parity(spark):
    """Kernel vs an independent pure-Python canonicalizer over a
    generated matrix of param orderings, tracking mixes, empty queries,
    and no-query URLs."""
    from itertools import permutations

    from crawler_spark.functions import urlfeat

    def py_canon(url: str) -> str:
        base, _, query = url.partition("?")
        keep = sorted(
            p for p in query.split("&")
            if p and not p.startswith(("utm_", "gclid=", "fbclid=", "msclkid="))
        )
        return base + ("?" + "&".join(keep) if keep else "")

    params = ["a=1", "b=2", "utm_source=x", "gclid=g1", "c=", "msclkid=m"]
    urls = ["https://h.com/p", "https://h.com/p?", "https://h.com/p?utm_only=1"]
    for r in (2, 3):
        for combo in permutations(params, r):
            urls.append("https://h.com/p?" + "&".join(combo))
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = df.select(
        "url", urlfeat.canonical_url(df.url).alias("canon")
    ).collect()
    for row in got:
        assert row.canon == py_canon(row.url), row.url


def test_html_meta_extraction(spark):
    pages = spark.createDataFrame(
        [
            (1, '<html lang="en"><head><title> A Title </title>'
                '<meta name="description" content="d1">'
                '<link rel="canonical" href="https://x.com/a">'
                "</head><body>x</body></html>"),
            (2, '<HTML LANG="fr"><HEAD><TITLE>B</TITLE></HEAD>x</HTML>'),
            (3, "<html><body>no head at all</body></html>"),
        ],
        ["doc_id", "html"],
    )
    got = _rows(textops.html_meta(pages), "doc_id")
    a = got[1]
    assert a["title"] == "A Title" and a["title_len"] == 7  # trimmed
    assert a["meta_desc"] == "d1"
    assert a["canonical"] == "https://x.com/a"
    assert a["lang_attr"] == "en"
    b = got[2]
    assert b["title"] == "B" and b["lang_attr"] == "fr"  # (?i) both attrs
    assert b["meta_desc"] == "" and b["canonical"] == ""
    c = got[3]  # ExtraString contract: '' on every no-match
    assert (c["title"], c["meta_desc"], c["canonical"], c["lang_attr"]) == \
        ("", "", "", "") and c["title_len"] == 0


def test_img_alt_pairs_filters_and_order(spark):
    pages = spark.createDataFrame(
        [
            (1, '<body><img src="/a.jpg" alt="a fine caption">'
                '<img src="/b.jpg">'                      # no alt: dropped
                '<IMG ALT="upper tag ok" SRC="/c.jpg">'   # (?i), order-flipped
                '<img src="/d.jpg" alt="tiny">'           # < 5 chars: dropped
                '<img alt="no src here at all">'          # no src: dropped
                '<img src="/e.jpg" alt="  padded alt  ">'  # trimmed
                "</body>"),
            (2, "<body>no images</body>"),
        ],
        ["doc_id", "html"],
    )
    rows = textops.img_alt_pairs(pages).collect()
    assert {r.doc_id for r in rows} == {1}
    got = {r.img_idx: (r.src, r.alt, r.alt_len) for r in rows}
    assert got == {
        0: ("/a.jpg", "a fine caption", 14),
        2: ("/c.jpg", "upper tag ok", 12),
        5: ("/e.jpg", "padded alt", 10),
    }


def test_robots_meta_directives(spark):
    pages = spark.createDataFrame(
        [
            (1, '<head><meta name="robots" content="noindex"></head>'
                '<a href="/x">x</a>'),
            (2, '<head><meta name="robots" content="NONE"></head>'
                '<a href="/x" rel="nofollow">x</a><a href="/y">y</a>'),
            (3, "<head></head><a rel='single-quoted' href='/x'>x</a>"
                '<a rel="ugc nofollow" href="/y">y</a>'),
            (4, '<head><meta name="robots" content="NOFOLLOW"></head>'),
        ],
        ["doc_id", "html"],
    )
    got = _rows(textops.robots_meta(pages), "doc_id")
    assert got[1]["noindex"] and not got[1]["nofollow"]
    assert got[2]["noindex"] and got[2]["nofollow"]  # 'none' implies both
    assert got[2]["n_links"] == 2 and got[2]["n_nofollow_links"] == 1
    assert not got[3]["noindex"] and not got[3]["nofollow"]
    assert got[3]["n_links"] == 2 and got[3]["n_nofollow_links"] == 1
    assert got[4]["nofollow"] and not got[4]["noindex"]  # case-folded
    assert got[4]["n_links"] == 0
