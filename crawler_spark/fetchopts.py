"""S7/S8 fetch options as deterministic column expressions.

The reference picks a proxy by atomic round-robin counter
(/root/reference/proxy/proxy.go:12-42) and a User-Agent by RNG over
per-browser-family generators (/root/reference/extensions/randomua.go:
9-23, generators to :285).  Both are *fetch-side* config with no
relational semantics — but a Spark-native fetcher (the mapInPandas
variant of S5 that would do real HTTP) still needs them, and in a
deterministic, partition-parallel engine they must be pure functions of
the row, not shared mutable counters:

- proxy: ``pmod(xxhash64(url), n_proxies)`` — uniform like round-robin,
  stable per URL (retries reuse the same egress, which is what you want
  for sticky sessions), no cross-executor coordination.
- UA: hash-pick a family, then hash-derive the version numbers within
  the family's real-world ranges — the same shape randomua.go generates,
  minus the nondeterminism.

Both are tested for determinism and distribution; neither is in the
corpus-join hot path (the sandbox fetch IS the join, SURVEY.md §2.1 S5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# UA templates mirroring randomua.go's browser families; {v}/{m} slots
# are hash-derived per URL below.
UA_TEMPLATES = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/{v}.0.{m}.100 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:{v}.0) "
    "Gecko/20100101 Firefox/{v}.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/{v}.0 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/{v}.0.{m}.71 Safari/537.36 OPR/{v}.0.0.0",
    "Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/{v}.0.{m}.105 Mobile Safari/537.36",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X) "
    "AppleWebKit/605.1.15 (KHTML, like Gecko) Version/{v}.0 Mobile/15E148 "
    "Safari/604.1",
)


def proxy_col(url: Column, proxies: list[str]) -> Column:
    """Deterministic proxy assignment — the round-robin twin.  Returns
    null for an empty proxy list (direct fetch)."""
    if not proxies:
        return F.lit(None).cast("string")
    idx = F.pmod(F.xxhash64(url, F.lit("proxy")), F.lit(len(proxies)))
    m = F.create_map(*[F.lit(x) for i, p in enumerate(proxies) for x in (i, p)])
    return F.element_at(m, idx.cast("int"))


def user_agent_col(url: Column) -> Column:
    """Deterministic UA per URL: hash-pick a family template, hash-derive
    major version (~100-120) and a build number, exactly the value space
    randomua.go samples randomly."""
    fam = F.pmod(F.xxhash64(url, F.lit("ua_family")), F.lit(len(UA_TEMPLATES)))
    v = (F.pmod(F.xxhash64(url, F.lit("ua_major")), F.lit(21)) + 100).cast("string")
    m = (F.pmod(F.xxhash64(url, F.lit("ua_build")), F.lit(5000)) + 1000).cast("string")
    out = F.lit(None).cast("string")
    for i, tpl in enumerate(UA_TEMPLATES):
        parts: list[Column] = []
        rest = tpl
        while "{v}" in rest or "{m}" in rest:
            iv, im = rest.find("{v}"), rest.find("{m}")
            if im == -1 or (iv != -1 and iv < im):
                lit, rest = rest[:iv], rest[iv + 3:]
                parts += [F.lit(lit), v]
            else:
                lit, rest = rest[:im], rest[im + 3:]
                parts += [F.lit(lit), m]
        parts.append(F.lit(rest))
        out = F.when(fam == i, F.concat(*parts)).otherwise(out)
    return out
