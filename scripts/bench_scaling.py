#!/usr/bin/env python3
"""Two-parallelism scaling evidence (BASELINE.md measurement protocol).

The north_rule's ">=0.8 throughput-scaling efficiency from N to 4N
executors" criterion cannot use a real cluster in this sandbox, so it is
evidenced by running the SAME crawl job on the SAME corpus bytes at two
local parallelism levels:

    N  = local[8]    (shuffle.partitions=8)
    4N = local[32]   (shuffle.partitions=32)

Each level runs in a fresh subprocess (own JVM, identical heap).  The
metric is steady-state URLs scheduled+fetched+deduped per second
(rounds >= 2; round 1 is corpus decode+cache warmup) — best of R runs
per level, since the sandbox VM has visible run-to-run noise.

    scaling_efficiency = (tput_32 / 32) / (tput_8 / 8)

Writes BENCH/scaling_last_run.md (raw artifact; the curated
evidence doc BENCH/BASELINE.md is maintained by hand from it) and
prints one JSON summary line.

Usage: python scripts/bench_scaling.py [--hosts H] [--filler F] [--reps R]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, corpus: str, env: dict, rep: int) -> dict:
    out_json = f"/tmp/bench_scale_c{cores}_r{rep}.json"
    cmd = [
        sys.executable, os.path.join(REPO, "bench.py"),
        "--crawl-only", "--cores", str(cores), "--corpus", corpus,
        "--json", out_json,
    ]
    t0 = time.time()
    res = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if res.returncode != 0:
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-4000:])
        raise RuntimeError(f"bench run failed (cores={cores})")
    with open(out_json) as f:
        data = json.load(f)
    data["crawl"]["subprocess_wall"] = round(time.time() - t0, 1)
    return data["crawl"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=24000)
    ap.add_argument("--filler", type=int, default=200_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--heap", default="24g")
    args = ap.parse_args()

    corpus = f"/tmp/crawl_scale_corpus_h{args.hosts}_f{args.filler}"
    env = dict(os.environ)
    env.update(
        CRAWL_BENCH_HOSTS=str(args.hosts),
        CRAWL_BENCH_FILLER=str(args.filler),
        SPARK_GRAFT_DRIVER_MEM=args.heap,
        PYTHONPATH=REPO,
    )

    results: dict[int, list[dict]] = {args.low: [], args.high: []}
    # high first: generates the corpus once at full parallelism
    for rep in range(args.reps):
        for cores in (args.high, args.low):
            r = run_level(cores, corpus, env, rep)
            results[cores].append(r)
            print(f"cores={cores} rep={rep}: steady={r['steady_urls_per_sec']}"
                  f" urls/s, walls={r['round_walls']}", flush=True)

    best = {c: max(rs, key=lambda r: r["steady_urls_per_sec"])
            for c, rs in results.items()}
    lo, hi = best[args.low], best[args.high]
    t_lo, t_hi = lo["steady_urls_per_sec"], hi["steady_urls_per_sec"]
    eff = (t_hi / args.high) / (t_lo / args.low) if t_lo else 0.0

    summary = {
        "metric": "steady-state URLs scheduled+fetched+deduped per second",
        "low_cores": args.low, "high_cores": args.high,
        "tput_low": t_lo, "tput_high": t_hi,
        "tput_per_core_low": round(t_lo / args.low, 2),
        "tput_per_core_high": round(t_hi / args.high, 2),
        "scaling_efficiency": round(eff, 3),
        "pass": eff >= 0.8,
        "corpus_hosts": args.hosts, "corpus_filler": args.filler,
        "reps": args.reps, "heap": args.heap,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # Small smoke corpora must not stomp the adopted full-scale record
    # (BASELINE.md cites scaling_last_run.md for its raw JSON).
    name = ("scaling_last_run.md" if args.hosts >= 10_000
            else f"scaling_smoke_h{args.hosts}.md")
    md = os.path.join(REPO, "BENCH", name)
    with open(md, "w") as f:
        f.write(render_md(summary, results, lo, hi))
    print(json.dumps(summary))


def render_md(s: dict, results: dict, lo: dict, hi: dict) -> str:
    lines = [
        "# BENCH/BASELINE — two-parallelism scaling evidence",
        "",
        "Protocol: BASELINE.md (sandbox substitute for the N->4N executor",
        "criterion).  Same job, same corpus bytes, fresh JVM per run,",
        f"identical heap ({s['heap']}); steady-state = rounds >= 2 (round 1",
        "is corpus decode+cache warmup); best of "
        f"{s['reps']} runs per level (VM noise).",
        "",
        f"Corpus: {s['corpus_hosts']} hosts x 45 crawlable pages"
        f" + {s['corpus_filler']} filler pages (deterministic, seedless —",
        "every byte a pure function of row id; see crawler_spark/corpus.py).",
        "",
        "| parallelism | steady URLs/s | URLs/s/core | rounds | walls (s) |",
        "|---|---|---|---|---|",
        f"| local[{s['low_cores']}], shuffle={s['low_cores']} |"
        f" {s['tput_low']} | {s['tput_per_core_low']} | {lo['rounds']} |"
        f" {list(lo['round_walls'].values())} |",
        f"| local[{s['high_cores']}], shuffle={s['high_cores']} |"
        f" {s['tput_high']} | {s['tput_per_core_high']} | {hi['rounds']} |"
        f" {list(hi['round_walls'].values())} |",
        "",
        f"**scaling efficiency (per-core, {s['low_cores']}->"
        f"{s['high_cores']}): {s['scaling_efficiency']}** "
        f"({'PASS' if s['pass'] else 'FAIL'} vs the 0.8 bar)",
        "",
        "All runs:",
        "",
        "```json",
    ]
    for cores, rs in sorted(results.items()):
        for i, r in enumerate(rs):
            lines.append(json.dumps({"cores": cores, "rep": i, **r}))
    lines += ["```", ""]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
