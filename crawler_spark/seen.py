"""URL-seen membership: bloom pre-filter + exact anti-join (F4).

The reference's seen set is an exact in-memory ``map[string]bool`` keyed
md5(url+method) behind a mutex (/root/reference/engine/crawler.go:16-17,
163-177).  At 10^10 URLs the exact set must live in a table, and probing
it every round is a join against a huge build side — so a **bloom filter
pre-filter** splits candidates into "definitely new" (skip the join) and
"maybe seen" (exact anti-join confirms).  Bloom false positives therefore
cost a join probe, never a dropped URL (SURVEY.md §7 hard part 2).

Scale notes:
- the bloom is built *distributed* (per-partition numpy bitmaps OR-merged
  on the driver) and broadcast.  The engine's default backend is
  :class:`IncrementalBloom`: the round's seen delta is OR-merged in and
  the filter is rebuilt from the seen table only on capacity saturation
  — never a full-table rebuild per round.  At 10^10 keys a single
  filter would be ~10 GB, so production additionally shards by Iceberg
  host-bucket and each executor loads only its buckets' shards; the
  build/probe API is shard-ready (``build_bloom(df, ...)`` takes any
  pre-filtered slice), and the cuckoo backend (engine.CuckooSeen) runs
  exactly that sharded update job today.
- the cuckoo fallback supports *deletion*, matching the reference's
  un-visit on fetch failure (crawler.go:180-185) for deployments whose
  long-lived filter must also forget.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd constant -> second hash stream


class Bloom:
    """Vectorized bloom filter over int64 keys (numpy bit array)."""

    def __init__(self, m_bits: int, k: int, bits: np.ndarray | None = None):
        self.m_bits = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros((m_bits + 7) // 8, dtype=np.uint8)

    @staticmethod
    def sized(n_items: int, fpp: float = 0.01) -> "Bloom":
        n = max(n_items, 1)
        m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        return Bloom(m, k)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        h1 = keys.astype(np.uint64)
        h2 = (h1 * _MIX) | np.uint64(1)
        idx = np.empty((self.k, len(keys)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.m_bits)
        return idx

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            p = pos[i]
            out &= (self.bits[(p >> 3).astype(np.int64)] >> (p & 7).astype(np.uint8)) & 1 == 1
        return out

    def merge(self, other: "Bloom") -> None:
        assert (self.m_bits, self.k) == (other.m_bits, other.k)
        np.bitwise_or(self.bits, other.bits, out=self.bits)


def build_bloom_bits(df: DataFrame, key_col: str, m_bits: int, k: int) -> Bloom:
    """Distributed build at a FIXED geometry: one partial bitmap per
    partition, OR-merged on the driver."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b = Bloom(m_bits, k)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                b.add(pdf[key_col].to_numpy(dtype=np.int64))
        if any_rows:
            yield pd.DataFrame({"bits": [b.bits.tobytes()]})

    parts = df.select(key_col).mapInPandas(partial, schema="bits binary").collect()
    out = Bloom(m_bits, k)
    for row in parts:
        out.merge(Bloom(m_bits, k, np.frombuffer(row.bits, dtype=np.uint8).copy()))
    return out


def build_bloom(df: DataFrame, key_col: str, n_items: int, fpp: float = 0.01) -> Bloom:
    """Distributed build sized for ``n_items`` at ``fpp``."""
    proto = Bloom.sized(n_items, fpp)
    return build_bloom_bits(df, key_col, proto.m_bits, proto.k)


class IncrementalBloom:
    """Long-lived bloom seen pre-filter maintained ACROSS rounds (the
    default ``seen_filter='bloom'`` backend in the engine).

    The previous shape rebuilt the filter from the FULL seen table every
    round — a whole-table scan plus full-bitmap build per round, which
    at a 10^10-row seen set is the round's dominant fixed cost.  Here the
    round's seen delta is OR-merged in (partial bitmaps per partition,
    identical distributed build), and the filter is rebuilt from the
    seen table only when inserts saturate the sized capacity — capacity
    doubles on rebuild, so rebuild work is amortized O(1) scans over the
    crawl, exactly Iceberg-compaction economics.  Bloom semantics keep
    this exactness-free: false positives only cost the confirming
    anti-join probe, and OR-merging can never create a false negative.
    """

    def __init__(self, capacity: int, fpp: float = 0.01):
        self.capacity = max(int(capacity), 1024)
        self.fpp = fpp
        self.bloom = Bloom.sized(self.capacity, fpp)
        self.n = 0

    # duck-typed probe for dedup_candidates / split_by_filter
    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        return self.bloom.contains(np.asarray(keys, dtype=np.int64))

    def saturated_by(self, n_more: int) -> bool:
        return self.n + n_more > self.capacity

    def or_delta(self, delta_df: DataFrame, n_new: int) -> None:
        """OR the round's new keys in, at the filter's fixed geometry."""
        if n_new <= 0:
            return
        part = build_bloom_bits(
            delta_df, "url_hash", self.bloom.m_bits, self.bloom.k
        )
        self.bloom.merge(part)
        self.n += n_new

    def rebuild_from(self, seen_df: DataFrame, n_total: int) -> None:
        """Re-size to 2x the current membership and rebuild from the
        authoritative seen table (resume load / saturation)."""
        self.capacity = max(2 * int(n_total), 1024)
        self.bloom = build_bloom(
            seen_df, "url_hash", n_items=self.capacity, fpp=self.fpp
        )
        self.n = int(n_total)


def split_by_bloom(
    candidates: DataFrame, bloom: Bloom, key_col: str = "url_hash",
    bc_sink: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (definitely_new, maybe_seen).  Probe is an Arrow-batched pandas
    UDF over the broadcast bitmap; exactness restored downstream by the
    anti-join on maybe_seen only.  ``bc_sink``: the broadcast handle is
    appended so the caller can destroy it once the round's actions are
    done — without it a 64-round crawl accrues one bitmap broadcast per
    round on driver and executors."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((bloom.m_bits, bloom.k, bloom.bits))
    if bc_sink is not None:
        bc_sink.append(bc)

    @F.pandas_udf("boolean")
    def might_contain(keys: pd.Series) -> pd.Series:
        m, k, bits = bc.value
        b = Bloom(m, k, bits)
        return pd.Series(b.contains(keys.to_numpy(dtype=np.int64)))

    flagged = candidates.withColumn("_maybe", might_contain(F.col(key_col)))
    return (
        flagged.where(~F.col("_maybe")).drop("_maybe"),
        flagged.where(F.col("_maybe")).drop("_maybe"),
    )


def dedup_candidates(
    candidates: DataFrame,
    seen_df: DataFrame,
    seen_count: int,
    use_bloom: bool = True,
    fpp: float = 0.01,
    min_seen: int = 1024,
    cuckoo=None,
    bc_sink: list | None = None,
) -> DataFrame:
    """Exact F4 semantics: candidates minus seen (left anti on url_hash),
    with an approximate pre-filter fast path once the seen set outgrows
    ``min_seen`` (below that the filter build/probe costs more than the
    join it saves).  The pre-filter is either the per-round distributed
    bloom, or — when ``cuckoo`` is passed — the engine's long-lived
    incremental cuckoo filter (supports deletion on un-visit, the
    reference's crawler.go:180-185 semantics).  Either way false
    positives only cost an exact-join probe, never a dropped URL.

    ``cuckoo``: any object exposing a vectorized
    ``contains_many(np.int64[:]) -> bool[:]`` (a raw :class:`Cuckoo` or
    the engine's sharded ``CuckooSeen``).  ``bc_sink`` collects the
    round's broadcast handles for end-of-round destruction."""
    if seen_count == 0:
        return candidates
    if cuckoo is not None and seen_count >= min_seen:
        fresh, maybe = split_by_filter(candidates, cuckoo.contains_many,
                                       bc_sink=bc_sink)
    elif use_bloom and seen_count >= min_seen:
        bloom = build_bloom(seen_df, "url_hash", n_items=seen_count, fpp=fpp)
        fresh, maybe = split_by_bloom(candidates, bloom, bc_sink=bc_sink)
    else:
        return candidates.join(
            seen_df.select("url_hash"), on="url_hash", how="left_anti"
        )
    confirmed = maybe.join(seen_df.select("url_hash"), on="url_hash", how="left_anti")
    return fresh.unionByName(confirmed)


def split_by_filter(
    candidates: DataFrame, approx_contains, key_col: str = "url_hash",
    bc_sink: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Generic (definitely_new, maybe_seen) split for any vectorized
    approximate-membership probe ``approx_contains(np.int64[:]) -> bool[:]``
    (bloom or cuckoo).  Probe runs as an Arrow-batched pandas UDF over
    broadcast filter state; exactness restored downstream by the
    anti-join on maybe_seen only.  ``bc_sink``: see split_by_bloom."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(approx_contains)
    if bc_sink is not None:
        bc_sink.append(bc)

    @F.pandas_udf("boolean")
    def might_contain(keys: pd.Series) -> pd.Series:
        return pd.Series(bc.value(keys.to_numpy(dtype=np.int64)))

    flagged = candidates.withColumn("_maybe", might_contain(F.col(key_col)))
    return (
        flagged.where(~F.col("_maybe")).drop("_maybe"),
        flagged.where(F.col("_maybe")).drop("_maybe"),
    )


# ---------------------------------------------------------------- cuckoo
class Cuckoo:
    """Partition-local cuckoo filter (4-slot buckets, 16-bit fingerprints)
    with deletion — the incremental-seen-set fallback (north_rule).  Used
    when one long-lived filter must also *forget* failed fetches the way
    the reference un-visits them (crawler.go:180-185)."""

    MAX_KICKS = 500

    def __init__(self, n_buckets: int):
        self.n = 1 << max(4, (n_buckets - 1).bit_length())  # power of two
        self.table = np.zeros((self.n, 4), dtype=np.uint16)
        self._rng_state = 0x2545F4914F6CDD1D

    @staticmethod
    def sized(n_items: int) -> "Cuckoo":
        return Cuckoo(max(16, int(n_items / 4 / 0.84) + 1))

    @staticmethod
    def wrap(table: np.ndarray) -> "Cuckoo":
        """Adopt an existing (n, 4) uint16 table without reallocating —
        the deserialization path for shard tables shipped back from
        executors (engine.CuckooSeen)."""
        c = object.__new__(Cuckoo)
        c.n = table.shape[0]
        c.table = table
        c._rng_state = 0x2545F4914F6CDD1D
        return c

    def _fp(self, key: int) -> int:
        fp = (key ^ (key >> 17)) & 0xFFFF
        return fp if fp != 0 else 1

    def _i1(self, key: int) -> int:
        return (key >> 16) & (self.n - 1)

    def _i2(self, i1: int, fp: int) -> int:
        return (i1 ^ (fp * 0x5BD1E995)) & (self.n - 1)

    def _next_rand(self) -> int:
        self._rng_state = (self._rng_state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return self._rng_state >> 33

    def add(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        i = i1 if self._next_rand() & 1 else i2
        for _ in range(self.MAX_KICKS):
            slot = self._next_rand() & 3
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._i2(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table full; caller should resize

    def contains(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: int) -> bool:
        fp = self._fp(key)
        i1 = self._i1(key)
        for i in (i1, self._i2(i1, fp)):
            hit = np.flatnonzero(self.table[i] == fp)
            if len(hit):
                self.table[i][hit[0]] = 0
                return True
        return False

    # vectorized conveniences for the engine's incremental-seen path
    def add_many(self, keys) -> int:
        ok = 0
        for k in keys:
            ok += bool(self.add(int(k)))
        return ok

    def delete_many(self, keys) -> int:
        ok = 0
        for k in keys:
            ok += bool(self.delete(int(k)))
        return ok

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized ``contains`` (int64 arithmetic shifts match the
        scalar path's Python semantics for negative hashes)."""
        ks = np.asarray(keys, dtype=np.int64)
        fp = (ks ^ (ks >> 17)) & np.int64(0xFFFF)
        fp = np.where(fp == 0, np.int64(1), fp).astype(np.uint16)
        mask = np.int64(self.n - 1)
        i1 = (ks >> 16) & mask
        i2 = (i1 ^ (fp.astype(np.int64) * np.int64(0x5BD1E995))) & mask
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2


def bloom_fpr_stats(
    members: DataFrame,
    probes: DataFrame,
    key_col: str = "key",
    m_bits: int = 2048,
    k: int = 4,
) -> DataFrame:
    """Relational twin of the bloom membership mechanism, built so the
    whole filter — bit positions, saturation, false-positive rate —
    is oracle-replayable: positions come from k 3-hex-digit md5 slices
    (``% m_bits``) instead of the production numpy double-hash family
    (:class:`Bloom`), the cross-engine md5 trick the sketch family
    documents.  The *mechanism* pinned here is exactly what the
    engine's pre-filter relies on: no member can miss (every member
    sets its own positions — the no-false-negative guarantee that
    makes bloom safe as a pre-filter in front of the exact anti-join,
    SURVEY §7 hard part 2), and non-member hits happen at a rate
    governed by saturation, compared against the analytic
    ``(bits_set/m)^k`` expectation.

    Returns ONE row: ``(n_members, bits_set, n_probes, n_false_pos,
    fpr_milli, expected_fpr_milli)`` where probes are assumed disjoint
    from members (every probe hit is a false positive).

    Scale shape: the bit table is ``distinct pos`` — at most m_bits
    rows however many members stream in (build is a bounded
    aggregation, the same property the numpy build gets from fixed
    bitmaps); probes explode to <= k rows each and join the
    m_bits-bounded bit table (broadcast).  The production engine keeps
    the numpy bitmap + mapInPandas probe (seen.Bloom) for constant
    factors; this twin exists for the correctness contract.
    """
    def pos(i: int) -> F.Column:
        return (
            F.conv(
                F.substring(F.md5(F.col(key_col)), 3 * i + 1, 3), 16, 10
            ).cast("int")
            % m_bits
        )

    karr = F.array_distinct(F.array(*[pos(i) for i in range(k)]))
    bitpos = (
        members.select(F.explode(karr).alias("pos")).distinct()
    )
    nm = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    bs = bitpos.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))

    pr = probes.select(
        F.col(key_col).alias("pkey"),
        karr.alias("pp"),
        F.size(karr).alias("np"),
    )
    hits = (
        pr.select("pkey", "np", F.explode("pp").alias("pos"))
        .join(F.broadcast(bitpos.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("pkey", "np")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("nhit"))
    )
    agg = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(
            F.when(F.col("nhit") == F.col("np"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_false_pos"),
    )
    m4 = m_bits ** k
    return (
        nm.crossJoin(F.broadcast(bs))
        .crossJoin(F.broadcast(agg))
        .select(
            "n_members",
            "bits_set",
            "n_probes",
            "n_false_pos",
            F.floor(F.col("n_false_pos") * F.lit(1000) / F.col("n_probes"))
            .cast("long")
            .alias("fpr_milli"),
            F.floor(
                (
                    F.col("bits_set")
                    * F.col("bits_set")
                    * F.col("bits_set")
                    * F.col("bits_set")
                    * F.lit(1000)
                ).cast("long")
                / F.lit(m4)
            )
            .cast("long")
            .alias("expected_fpr_milli"),
        )
    )
