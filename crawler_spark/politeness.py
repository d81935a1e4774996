"""Politeness: token buckets -> per-round budgets, robots.txt, skew rank.

The reference enforces politeness in the *time domain*: every fetch waits
on a multi-rate token bucket (/root/reference/limiter/limiter.go:16-45;
1 req/2s AND 20 req/60s, config.toml:5) plus a random sleep
(collect/request.go:52-53).  A round-based DataFrame engine enforces the
same contract in the *count domain* (SURVEY.md §4, §7 hard part 4):

    budget(task, host, round) = floor(min_bucket_rate(task) * round_secs)
    optionally min'd with floor(round_secs / robots.crawl_delay(host))

and admits the top-``budget`` frontier rows per (task, host) under the
scheduling order (priority DESC, seq ASC — schedule.go:52-62 semantics).
The random sleep is subsumed: it only slows the reference down, never
changes which URLs may be fetched in a window.

Skew (north_rule: "salted host-bucketed partitions to defeat hot-host
skew"): a single window over a hot host serializes that host's millions
of frontier rows through one task.  Two-phase rank fixes it:

  phase 1  rank within (task, host, salt), salt = url_hash mod S
           -> keeps at most S x budget rows per host, in parallel
  phase 2  exact rank within (task, host) over the tiny survivor set

Phase 1 never drops a row phase 2 would keep: the global top-k of a
(priority, seq) order is contained in the union of per-salt top-k's.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .rules import Task

def sched_order() -> list:
    """The determinism contract: priority DESC, discovery seq ASC."""
    return [F.col("priority").desc(), F.col("seq").asc()]


def base_budget(task: Task, round_seconds: float) -> int:
    """floor(min over token buckets of events/per_seconds * round_secs).

    limiter/limiter.go:33-41 waits on *every* bucket, so the effective
    rate is the min; config.toml:5's {1/2s, 20/60s} -> 1/3 req/s."""
    rate = min(e / s for e, s in task.rate_limits)
    return max(1, math.floor(rate * round_seconds))


def budget_col(tasks: dict[str, Task], round_seconds: float) -> F.Column:
    """Per-row base budget looked up from task_name (tiny literal map)."""
    kv = []
    for name, t in tasks.items():
        kv += [F.lit(name), F.lit(base_budget(t, round_seconds))]
    return F.element_at(F.create_map(*kv), F.col("task_name"))


def apply_robots(
    candidates: DataFrame, robots: DataFrame | None, round_seconds: float
) -> DataFrame:
    """Left-join broadcast robots; drop disallowed paths; attach the
    crawl-delay budget cap as ``robots_budget`` (null = uncapped)."""
    if robots is None:
        return candidates.withColumn("robots_budget", F.lit(None).cast("int"))
    r = robots.select(
        "host",
        "crawl_delay_s",
        F.coalesce("disallow_prefixes", F.array()).alias("_dis"),
    )
    out = candidates.join(F.broadcast(r), on="host", how="left")
    path = F.coalesce(
        F.nullif(F.regexp_extract("url_norm", r"^[a-z][a-z0-9+.\-]*://[^/?#]*(/[^?#]*)", 1), F.lit("")),
        F.lit("/"),
    )
    disallowed = F.exists("_dis", lambda p: path.startswith(p))
    out = out.where(~F.coalesce(disallowed, F.lit(False)))
    robots_budget = F.when(
        F.col("crawl_delay_s").isNotNull() & (F.col("crawl_delay_s") > 0),
        F.greatest(F.floor(F.lit(round_seconds) / F.col("crawl_delay_s")), F.lit(1)),
    ).cast("int")
    return out.withColumn("robots_budget", robots_budget).drop("crawl_delay_s", "_dis")


def rank_by_budget(
    candidates: DataFrame,
    tasks: dict[str, Task],
    round_seconds: float,
    salt_buckets: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """-> (scheduled, deferred) via per-host top-k under SCHED_ORDER.

    Budget = min(base token-bucket budget, robots crawl-delay budget).
    Deferred rows stay pending for the next round — phase 1 *defers*,
    never drops.
    """
    df = candidates.withColumn(
        "_budget",
        F.least(
            budget_col(tasks, round_seconds),
            F.coalesce(F.col("robots_budget"), F.lit(1 << 30)),
        ),
    ).drop("robots_budget")
    deferred_parts: list[DataFrame] = []
    if salt_buckets > 1:
        df = df.withColumn("_salt", F.pmod(F.col("url_hash"), F.lit(salt_buckets)))
        w1 = Window.partitionBy("task_name", "host", "_salt").orderBy(*sched_order())
        df = df.withColumn("_rn1", F.row_number().over(w1))
        deferred_parts.append(
            df.where(F.col("_rn1") > F.col("_budget")).drop("_rn1", "_salt", "_budget")
        )
        # phase 1 keeps <= salt_buckets x budget rows per host (parallel
        # across salts); phase 2 is exact on that small survivor set
        df = df.where(F.col("_rn1") <= F.col("_budget")).drop("_rn1", "_salt")
    w2 = Window.partitionBy("task_name", "host").orderBy(*sched_order())
    df = df.withColumn("_rn", F.row_number().over(w2))
    scheduled = df.where(F.col("_rn") <= F.col("_budget")).drop("_rn", "_budget")
    deferred_parts.append(df.where(F.col("_rn") > F.col("_budget")).drop("_rn", "_budget"))
    deferred = deferred_parts[0]
    for d in deferred_parts[1:]:
        deferred = deferred.unionByName(d)
    return scheduled, deferred
