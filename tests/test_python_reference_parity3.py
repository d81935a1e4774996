"""Third-engine randomized parity, part 3 — the older late-r4
never-driver-checked extraction kernels: date_extract, img_alt_pairs,
robots_meta, html_meta.  Same discipline as parts 1-2.
"""

from __future__ import annotations

import os
import random
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dates, textops  # noqa: E402

ISO_RE = re.compile(
    r"((?:19|20)\d{2}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12]\d|3[01]))")
MONTHS = dates.MONTHS


def _py_date(html, url):
    m = re.search(r'article:published_time[^>]*content="'
                  + ISO_RE.pattern, html)
    if m:
        return m.group(1), "meta"
    m = re.search(r'<time[^>]*datetime="' + ISO_RE.pattern, html)
    if m:
        return m.group(1), "time"
    m = re.search(r'"datePublished"\s*:\s*"' + ISO_RE.pattern, html)
    if m:
        return m.group(1), "jsonld"
    m = re.search(
        r"/((?:19|20)\d{2})/(0[1-9]|1[0-2])/(0[1-9]|[12]\d|3[01])/", url)
    if m:
        return "-".join(m.groups()), "url"
    m = ISO_RE.search(html)
    if m:
        return m.group(1), "text"
    m = re.search(
        r"(?i)(January|February|March|April|May|June|July|August"
        r"|September|October|November|December)\s+(\d{1,2}),\s+"
        r"((?:19|20)\d{2})", html)
    if m and 1 <= int(m.group(2)) <= 31:
        mm = MONTHS.index(m.group(1).lower()) + 1
        return f"{m.group(3)}-{mm:02d}-{int(m.group(2)):02d}", "text_us"
    return None, None


def test_date_extract_vs_python(spark):
    rng = random.Random(11)
    rows = []
    frags = [
        lambda d: f'<meta property="article:published_time" content="{d}T01:02:03Z">',
        lambda d: f'<time datetime="{d}">x</time>',
        lambda d: f'{{"datePublished": "{d}"}}',
        lambda d: f"posted {d} ok",
        lambda d: "Published May 5, 2019",
        lambda d: "published FEBRUARY 9, 2001!",
        lambda d: "bad date 2021-13-40",
        lambda d: "no date",
    ]
    for i in range(150):
        d = (f"{2000 + rng.randint(0, 20)}-{rng.randint(1, 12):02d}"
             f"-{rng.randint(1, 28):02d}")
        picks = rng.sample(frags, rng.randint(1, 3))
        html = "<body>" + " ".join(p(d) for p in picks) + "</body>"
        url = (f"https://e.com/{d.replace('-', '/')}/p"
               if rng.random() < 0.3 else "https://e.com/p")
        rows.append((i, html, url))
    df = spark.createDataFrame(rows, "doc_id long, html string, url string")
    got = {r["doc_id"]: (r["pub_date"], r["date_src"])
           for r in dates.date_extract(df).collect()}
    for i, html, url in rows:
        assert got[i] == _py_date(html, url), (html, url)


def test_img_alt_pairs_vs_python(spark):
    rng = random.Random(12)
    rows = []
    for i in range(100):
        tags = []
        for t in range(rng.randint(0, 4)):
            attrs = []
            if rng.random() < 0.8:
                attrs.append(f'src="/img/{i}_{t}.png"')
            if rng.random() < 0.8:
                attrs.append(
                    'alt="' + " ".join(
                        rng.choice(["a", "tiny", "a caption of words"])
                        for _ in range(rng.randint(0, 3))) + '"')
            rng.shuffle(attrs)
            tags.append("<img " + " ".join(attrs) + ">")
        rows.append((i, "<p>x</p>".join(tags)))
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {}
    for r in textops.img_alt_pairs(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["img_idx"], r["src"], r["alt"], r["alt_len"]))
    for i, html in rows:
        want = []
        for idx, tag in enumerate(re.findall(r"(?i)<img\b[^>]*>", html)):
            sm = re.search(r'(?i)src="([^"]*)"', tag)
            am = re.search(r'(?i)alt="([^"]*)"', tag)
            src = sm.group(1) if sm else ""
            alt = (am.group(1) if am else "").strip()
            if src and len(alt) >= 5:
                want.append((idx, src, alt, len(alt)))
        assert sorted(got.get(i, [])) == sorted(want), html


def test_robots_meta_vs_python(spark):
    rng = random.Random(13)
    rows = []
    for i in range(100):
        content = rng.choice(
            ["", "noindex", "nofollow", "noindex, nofollow", "NONE",
             "index, follow"])
        meta = (f'<meta name="robots" content="{content}">'
                if rng.random() < 0.8 else "")
        anchors = "".join(
            '<a href="/x"' + (
                ' rel="nofollow"' if rng.random() < 0.4 else
                (' rel="ugc nofollow"' if rng.random() < 0.2 else "")
            ) + ">t</a>"
            for _ in range(rng.randint(0, 5))
        )
        rows.append((i, f"<head>{meta}</head><body>{anchors}</body>"))
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r.asDict()
           for r in textops.robots_meta(df).collect()}
    for i, html in rows:
        m = re.search(
            r'(?i)<meta[^>]+name="robots"[^>]+content="([^"]*)"', html)
        c = (m.group(1) if m else "").lower()
        none = "none" in c
        noindex = "noindex" in c or none
        nofollow = "nofollow" in c or none
        n_links = len(re.findall(r"(?i)<a\b[^>]*>", html))
        n_nof = len(re.findall(
            r'(?i)<a\b[^>]*rel="[^"]*nofollow[^"]*"[^>]*>', html))
        g = got[i]
        assert (g["noindex"], g["nofollow"], g["n_links"],
                g["n_nofollow_links"]) == (noindex, nofollow, n_links,
                                           n_nof), html


def test_html_meta_vs_python(spark):
    rng = random.Random(14)
    rows = []
    for i in range(100):
        parts = ["<html" + (f' lang="{rng.choice(["en", "de-AT"])}"'
                            if rng.random() < 0.6 else "") + ">"]
        if rng.random() < 0.8:
            parts.append(f"<title>  Doc {i} title  </title>")
        if rng.random() < 0.5:
            parts.append(f'<meta name="description" content="desc {i}">')
        if rng.random() < 0.5:
            parts.append(f'<link rel="canonical" href="https://c/{i}">')
        rows.append((i, "".join(parts) + "<body>b</body></html>"))
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r.asDict()
           for r in textops.html_meta(df).collect()}
    for i, html in rows:
        t = re.search(r"(?i)<title[^>]*>([^<]*)</title>", html)
        title = (t.group(1) if t else "").strip()
        d = re.search(
            r'(?i)<meta[^>]+name="description"[^>]+content="([^"]*)"', html)
        c = re.search(
            r'(?i)<link[^>]+rel="canonical"[^>]+href="([^"]*)"', html)
        lg = re.search(r'(?i)<html[^>]+lang="([^"]*)"', html)
        g = got[i]
        assert g["title"] == title and g["title_len"] == len(title)
        assert g["meta_desc"] == (d.group(1) if d else "")
        assert g["canonical"] == (c.group(1) if c else "")
        assert g["lang_attr"] == (lg.group(1) if lg else "")
