"""Third-engine randomized parity: seeded-random inputs run through
the Spark kernels AND independent plain-Python implementations (no
Spark, no SQL) — a different engine from both Spark and the DuckDB
oracles, so a shared-blind-spot bug in regex/aggregation semantics has
to fool three implementations to slip through.

One batch per kernel (one Spark job), fixed seeds — deterministic.
"""

from __future__ import annotations

import os
import random
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.functions import dedup, hoststats, snapshots  # noqa: E402


def _norm(s):
    return re.sub(r"\s+", " ", s.lower(), flags=re.ASCII).strip()


def test_mirror_hosts_vs_bruteforce(spark):
    rng = random.Random(41)
    rows = []
    # 12 hosts x ~14 pages drawn from a 60-page universe with host-
    # biased overlap so some pairs cross the threshold and most don't.
    for h in range(12):
        base = h % 4  # hosts sharing a base draw from similar pages
        for _ in range(rng.randint(10, 18)):
            page = rng.randint(0, 14) + base * 15
            rows.append((f"h{h:02d}", f"Page {page} body text"))
    df = spark.createDataFrame(rows, "host string, text string")
    got = {
        (r["host_lo"], r["host_hi"]): (r["shared"], r["overlap_micro"])
        for r in hoststats.mirror_hosts(
            df, min_shared=2, threshold_micro=400_000,
            max_hosts_per_fp=None,
        ).collect()
    }
    # brute force
    fps = defaultdict(set)
    for h, t in rows:
        fps[h].add(_norm(t))
    want = {}
    hs = sorted(fps)
    for i, a in enumerate(hs):
        for b in hs[i + 1:]:
            shared = len(fps[a] & fps[b])
            if shared < 2:
                continue
            ov = shared * 1_000_000 // min(len(fps[a]), len(fps[b]))
            if ov >= 400_000:
                want[(a, b)] = (shared, ov)
    assert got == want and want  # non-vacuous


def test_site_template_vs_python(spark):
    rng = random.Random(42)
    lines_pool = [f"common line {i}" for i in range(6)]
    rows = []
    for d in range(60):
        h = f"s{d % 5}"
        n = rng.randint(1, 6)
        lines = [rng.choice(lines_pool) for _ in range(n)]
        lines.append(f"unique {d}")
        rng.shuffle(lines)
        rows.append((d, h, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_text"])
        for r in dedup.drop_site_template_lines(
            df, "doc_id", min_docs=4
        ).collect()
    }
    owners = defaultdict(set)
    for d, h, t in rows:
        for ln in t.split("\n"):
            owners[(h, ln.strip())].add(d)
    want = {}
    for d, h, t in rows:
        ls = t.split("\n")
        kept = [l for l in ls if len(owners[(h, l.strip())]) < 4]
        want[d] = (len(ls), len(kept), "\n".join(kept))
    assert got == want
    assert any(k[1] < k[0] for k in want.values())  # some line dropped


def test_cache_policy_vs_python(spark):
    rng = random.Random(43)
    directives = [
        "max-age={}", "no-store", "no-cache", "private", "public",
        "s-maxage={}", "must-revalidate",
    ]
    rows = []
    for i in range(120):
        parts = []
        if rng.random() < 0.8:
            chosen = rng.sample(directives, rng.randint(1, 3))
            vals = [c.format(rng.choice([0, 60, 3600, 10**9]))
                    for c in chosen]
            parts.append("Cache-Control: " + ", ".join(vals))
        if rng.random() < 0.4:
            parts.append(f'ETag: "e{i}"')
        if rng.random() < 0.3:
            parts.append("Last-Modified: Tue, 01 Jan 2019 00:00:00 GMT")
        parts.append("Server: x")
        rows.append((i, "HTTP/1.1 200 OK\r\n" + "\r\n".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, headers string")
    got = {r["doc_id"]: r.asDict()
           for r in snapshots.cache_policy(df).collect()}

    for i, h in rows:
        sm = re.search(r"(?i)cache-control:[^\r\n]*s-maxage=(\d+)", h)
        ma = re.search(r"(?i)cache-control:[^\r\n]*max-age=(\d+)", h)
        declared = int(sm.group(1)) if sm else (
            int(ma.group(1)) if ma else None)
        no_store = bool(re.search(r"(?i)cache-control:[^\r\n]*no-store", h))
        no_cache = bool(re.search(r"(?i)cache-control:[^\r\n]*no-cache", h))
        has_etag = bool(re.search(r"(?i)^etag:|[\r\n]etag:", h))
        has_lm = bool(
            re.search(r"(?i)^last-modified:|[\r\n]last-modified:", h))
        if no_store:
            refetch = 60
        elif no_cache or declared is not None:
            refetch = min(max(0 if no_cache else declared, 60), 2592000)
        else:
            refetch = 86400
        g = got[i]
        assert g["max_age_s"] == declared, (i, h)
        assert g["no_store"] == no_store and g["no_cache"] == no_cache
        assert g["has_etag"] == has_etag
        assert g["has_validator"] == (has_etag or has_lm)
        assert g["refetch_after_s"] == refetch, (i, h)
