"""URL canonicalization + hashing.

The reference dedups on ``md5(raw_url + method)`` with no canonicalization
(/root/reference/collect/request.go:42-45).  The north_rule mandates a
canonicalized + murmur3/xxhash64 key.  Two implementations with identical
semantics:

- :func:`canon_col` / :func:`url_hash_col` — Spark Column expressions
  (JVM-side, whole-stage codegen; the engine's hot path)
- :func:`canon_py` / :func:`url_hash_py` — pure Python, used by the
  single-worker oracle and property tests

Canonical form (applied identically in both):

1. strip the fragment (``#...``)
2. lowercase the ``scheme://authority`` prefix
3. drop default ports (``http://h:80`` -> ``http://h``, ``https://h:443``)
4. empty path -> ``/``

Query strings and path case are preserved: the reference treats
``?start=0`` and ``?start=25`` as distinct requests and so do we.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREFIX_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"


def canon_col(url: Column) -> Column:
    no_frag = F.regexp_replace(url, r"#.*$", "")
    raw_prefix = F.regexp_extract(no_frag, _PREFIX_RE, 1)
    prefix = F.lower(raw_prefix)
    rest = F.substring(no_frag, F.length(raw_prefix) + 1, 1 << 30)
    prefix = F.regexp_replace(prefix, r"^(http://[^/:?#]+):80$", r"$1")
    prefix = F.regexp_replace(prefix, r"^(https://[^/:?#]+):443$", r"$1")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(prefix == "", no_frag).otherwise(F.concat(prefix, rest))


def host_col(url: Column) -> Column:
    """Lowercased host (no port) — the politeness partition key."""
    return F.lower(
        F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)", 1)
    )


def surt_col(url: Column) -> Column:
    """SURT-style sort key (web-archive CDX convention): host labels
    reversed and comma-joined, then ``)`` + canonical path+query —
    ``https://a.b.example.com/p?q=1`` → ``com,example,b,a)/p?q=1``.
    Grouping/sorting by SURT clusters a registrable domain's pages
    contiguously, which is what makes CDX indexes range-scannable;
    as a Spark sort key it also makes per-domain parquet row-groups
    contiguous (statistics-prunable).  Pure codegen string ops."""
    canon = canon_col(url)
    host = host_col(url)
    rest = F.regexp_replace(canon, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(
        F.concat_ws(",", F.reverse(F.split(host, r"\."))), F.lit(")"), rest
    )


def url_hash_col(url_norm: Column, method: Column) -> Column:
    """64-bit dedup key: xxhash64(canonical_url || '|' || method).

    xxhash64 is a codegen'd built-in; the '|' separator prevents
    (url='a', method='b') colliding with (url='ab', method='').
    """
    return F.xxhash64(F.concat_ws("|", url_norm, method))


# ------------------------------------------------------------- pure Python
import re as _re

_PREFIX_PY = _re.compile(_PREFIX_RE)


def canon_py(url: str) -> str:
    no_frag = _re.sub(r"#.*$", "", url)
    m = _PREFIX_PY.match(no_frag)
    if not m:
        return no_frag
    prefix = m.group(1).lower()
    rest = no_frag[len(m.group(1)):]
    prefix = _re.sub(r"^(http://[^/:?#]+):80$", r"\1", prefix)
    prefix = _re.sub(r"^(https://[^/:?#]+):443$", r"\1", prefix)
    if rest == "":
        rest = "/"
    return prefix + rest


def host_py(url: str) -> str:
    m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/:?#]+)", url)
    return m.group(1).lower() if m else ""


# Pure-Python XXH64 (public algorithm, https://xxhash.com spec) with
# Spark's fixed seed 42, so the offline oracle computes the exact same
# key as the JVM expression.  Verified equal in tests/test_urlnorm.py.
_M = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64_py(data: bytes, seed: int = 42) -> int:
    """XXH64 over raw bytes; returns Spark-style signed int64."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def url_hash_py(url_norm: str, method: str = "GET") -> int:
    """Offline twin of :func:`url_hash_col` (same bytes, same seed)."""
    return xxhash64_py(f"{url_norm}|{method}".encode("utf-8"))
