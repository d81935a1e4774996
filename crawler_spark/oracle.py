"""Pure-Python single-worker crawl oracle (SURVEY.md §5 item 2).

The reference's live ordering is nondeterministic (5 workers, random
sleeps, unbuffered-channel races — engine/crawler.go:42-44,
collect/request.go:52-53).  Its deterministic core — priority-first,
FIFO-within-priority (engine/schedule.go:52-62), dedup-at-pull
(crawler.go:85-90), retry-once (crawler.go:179-194), ban/short filters
(crawler.go:107-120) — discretized into politeness rounds exactly like
the Spark engine, IS the matchable contract.  This oracle implements that
contract in ~120 lines of plain Python over an in-memory corpus and is
what the Spark engine must agree with on:

- final URL-seen set (set equality)
- crawl order (round, priority DESC, seq ASC)
- extracted items, byte-for-byte

It shares the *same* parse kernels (parsers.parse_*_py) and the same URL
canonicalizer/hash (urlnorm.canon_py / url_hash_py), so any disagreement
is an engine dataflow bug, not a kernel drift.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from .parsers import parse_fields_py, parse_links_py, parse_match_py
from .rules import FieldsRule, LinkRule, MatchRule, Task
from .urlnorm import canon_py, host_py, url_hash_py


@dataclass
class OracleResult:
    seen: set[str] = field(default_factory=set)  # url_norm
    order: list[tuple[int, int, int, str]] = field(default_factory=list)
    # (round, priority, seq, url_norm) in scheduled order
    items: list[tuple[str, str, str, tuple]] = field(default_factory=list)
    # (task, rule, url, sorted data tuple)
    parked: list[str] = field(default_factory=list)
    rounds: int = 0


def crawl_oracle(
    tasks: dict[str, Task],
    corpus: dict[str, bytes],  # url_norm -> raw page bytes (UTF-8 html)
    round_seconds: float = 30.0,
    min_body_bytes: int = 6000,
    ban_marker: str = "你访问豆瓣的方式有点像机器人程序",
    max_attempts: int = 2,
    robots: dict[str, tuple[float | None, list[str]]] | None = None,
    max_rounds: int = 64,
    charset_sniff: bool = False,
) -> OracleResult:
    res = OracleResult()
    robots = robots or {}

    def decode(body: bytes) -> tuple[str, int]:
        """-> (text, gate_length).  With P11 sniffing, the short-body
        gate measures the UTF-8 re-encoding of the transcoded text, as
        the reference does (len over the transform.Reader output,
        crawler.go:113 after collect.go:43-47)."""
        if charset_sniff:
            from .charset import sniff_decode_py

            text = sniff_decode_py(body)
            return text, len(text.encode("utf-8"))
        return body.decode("utf-8"), len(body)

    def base_budget(task: Task) -> int:
        rate = min(e / s for e, s in task.rate_limits)
        return max(1, math.floor(rate * round_seconds))

    # ---- seed frontier (task order, seed order) — mirrors frontier.seed_frontier
    pending: list[dict] = []
    seq = 0
    for tname in sorted(tasks):
        for url, rule_name, priority in tasks[tname].seeds:
            un = canon_py(url)
            pending.append(
                dict(
                    url=url, url_norm=un, url_hash=url_hash_py(un),
                    host=host_py(url), task=tname, rule=rule_name,
                    depth=0, priority=priority, seq=seq,
                    tmp=None, attempts=0, parent_seq=-1, link_pos=0,
                )
            )
            seq += 1
    max_seq = seq - 1
    seen_hashes: set[int] = set()

    for round_no in range(1, max_rounds + 1):
        if not pending:
            break
        res.rounds = round_no
        # depth cutoff, seen dedup (reload tasks skip the visited check,
        # crawler.go:85)
        cand = [
            r for r in pending
            if r["depth"] <= tasks[r["task"]].max_depth
            and (tasks[r["task"]].reload or r["url_hash"] not in seen_hashes)
        ]
        # in-round duplicate URLs: keep schedulable-first copy; reload
        # rows are exempt (every pulled copy is fetched)
        best: dict[int, dict] = {}
        keep: list[dict] = []
        for r in sorted(cand, key=lambda r: (-r["priority"], r["seq"])):
            if tasks[r["task"]].reload:
                keep.append(r)
            else:
                best.setdefault(r["url_hash"], r)
        cand = sorted(
            list(best.values()) + keep, key=lambda r: (-r["priority"], r["seq"])
        )
        # robots disallow
        kept = []
        for r in cand:
            delay, prefixes = robots.get(r["host"], (None, []))
            path = r["url_norm"].split("://", 1)[-1]
            path = "/" + path.split("/", 1)[1] if "/" in path else "/"
            if any(path.startswith(p) for p in prefixes):
                continue
            kept.append(r)
        cand = kept
        # per-(task, host) budget rank
        taken: dict[tuple[str, str], int] = {}
        scheduled, deferred = [], []
        for r in cand:
            delay, _ = robots.get(r["host"], (None, []))
            k = base_budget(tasks[r["task"]])
            if delay:
                k = min(k, max(1, math.floor(round_seconds / delay)))
            key = (r["task"], r["host"])
            if taken.get(key, 0) < k:
                taken[key] = taken.get(key, 0) + 1
                scheduled.append(r)
            else:
                deferred.append(r)

        children, retries = [], []
        for r in scheduled:
            res.order.append((round_no, r["priority"], r["seq"], r["url_norm"]))
            body = corpus.get(r["url_norm"])
            task = tasks[r["task"]]
            if task.reload:
                # StoreVisited is unconditional (crawler.go:92) and
                # SetFailure does NOT un-visit reload tasks (:180-185)
                seen_hashes.add(r["url_hash"])
                res.seen.add(r["url_norm"])
            if body is None or ban_marker in decode(body)[0]:
                if r["attempts"] + 1 < max_attempts:
                    rr = dict(r)
                    rr["attempts"] += 1
                    rr["parent_seq"], rr["link_pos"] = r["seq"], 0
                    retries.append(rr)
                else:
                    res.parked.append(r["url_norm"])
                continue
            text, gate_len = decode(body)
            if gate_len < min_body_bytes:
                seen_hashes.add(r["url_hash"])
                res.seen.add(r["url_norm"])
                continue
            seen_hashes.add(r["url_hash"])
            res.seen.add(r["url_norm"])
            rule = task.rules[r["rule"]]
            if isinstance(rule, LinkRule):
                for pos, (u, t) in enumerate(parse_links_py(text, rule, r["url"])):
                    un = canon_py(u)
                    child = dict(
                        url=u, url_norm=un, url_hash=url_hash_py(un),
                        host=host_py(u), task=r["task"], rule=rule.next_rule,
                        depth=r["depth"] + 1, priority=rule.child_priority,
                        tmp={rule.tmp_key: t} if rule.title_group is not None else None,
                        attempts=0, parent_seq=r["seq"], link_pos=pos,
                    )
                    if child["depth"] <= task.max_depth:
                        children.append(child)
            elif isinstance(rule, MatchRule):
                if parse_match_py(text, rule):
                    res.items.append((r["task"], r["rule"], r["url"], ()))
            elif isinstance(rule, FieldsRule):
                data = parse_fields_py(text, rule, r["tmp"])
                res.items.append(
                    (r["task"], r["rule"], r["url"], tuple(sorted(data.items())))
                )

        # seq assignment: children (parent_seq, link_pos) then retries
        new_rows = sorted(children, key=lambda c: (c["parent_seq"], c["link_pos"]))
        new_rows += sorted(retries, key=lambda c: (c["parent_seq"], c["link_pos"]))
        for row in new_rows:
            max_seq += 1
            row["seq"] = max_seq
        pending = deferred + new_rows

    return res
