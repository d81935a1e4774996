"""S5/S6 real-network fetch seam: the production HTTP variant of the
fetch stage (the sandbox default joins the scheduled set against a pages
corpus — engine.run_round; SURVEY.md §2.1 S5 names this mapInPandas
kernel as the deployed shape).

Reference semantics (collect/collect.go:33-91, BrowserFetch.Get):
GET with a client timeout, optional proxy transport, the task's Cookie
header, a random User-Agent, non-200 status = fetch error; the body is
charset-determined on the first 1 KiB and transcoded to UTF-8
(collect.go:94-101).  Here:

- UA and proxy are the DETERMINISTIC per-URL columns from fetchopts
  (S7/S8) — same value space as the reference's RNG, reproducible
  across retries and executors.
- Cookie is per task (rules.Task.cookie), broadcast as a plain dict
  inside the serialized kernel (tiny: one string per task).
- The kernel returns RAW bytes + http_status; the engine's existing
  charset path (charset.sniff_decode_col, P11) does the UTF-8
  transcode downstream, so corpus mode and http mode share one decode
  implementation.  Non-200 / transport-error rows come back with NULL
  html and are dropped into the round's fetch-miss path (retry ->
  park, F7), exactly where a corpus-join miss lands.
- ``transport`` is injectable: tests run a fake (url, ua, proxy,
  cookie, timeout) -> (status, bytes) callable; production leaves it
  None and the kernel uses ``requests`` (import-gated — the sandbox
  has no network, so the default transport is exercised only by its
  import error message).

Scale shape: one Arrow batch in, one synchronous GET per row inside the
batch.  Politeness is enforced UPSTREAM (rank_by_budget capped this
host's rows this round), so a partition fetching sequentially is the
per-host crawl-delay behavior, not an accident; cross-host parallelism
comes from partitioning the scheduled set by host (done here) so one
slow host never stalls another host's partition.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fetchopts import proxy_col, user_agent_col

# (url, user_agent, proxy, cookie, timeout_s) -> (status_code, body_bytes)
Transport = Callable[[str, str | None, str | None, str | None, float],
                     "tuple[int, bytes]"]


def default_transport(url: str, user_agent: str | None, proxy: str | None,
                      cookie: str | None, timeout_s: float) -> "tuple[int, bytes]":
    """requests-backed GET mirroring BrowserFetch.Get (collect.go:56-91):
    timeout, proxy on both schemes, Cookie + User-Agent headers.  Any
    transport exception propagates to the caller's per-row try (-> fetch
    miss)."""
    import requests  # deferred: not needed (or guaranteed) in the sandbox

    headers: dict[str, str] = {}
    if user_agent:
        headers["User-Agent"] = user_agent
    if cookie:
        headers["Cookie"] = cookie
    proxies = {"http": proxy, "https": proxy} if proxy else None
    resp = requests.get(url, headers=headers, proxies=proxies,
                        timeout=timeout_s)
    return resp.status_code, resp.content


def fetch_http(
    scheduled: DataFrame,
    cookies: dict[str, str] | None = None,
    proxies: tuple[str, ...] = (),
    timeout_s: float = 10.0,
    transport: Transport | None = None,
) -> DataFrame:
    """Fetch every scheduled row over HTTP; returns the scheduled columns
    plus (html binary, body_bytes long, http_status int) for rows whose
    GET succeeded with status 200 — the same shape the corpus join
    produces, so engine.run_round's decode/flags/parse pipeline is
    identical in both modes.  Failed rows (non-200, timeout, transport
    error) are DROPPED here; the engine's left_anti miss computation
    routes them to retry/park.

    ``cookies`` maps task_name -> Cookie header (Task.Cookie,
    collect.go:70-72); ``proxies``/UA ride the deterministic fetchopts
    columns.
    """
    tp = transport or default_transport
    cookie_by_task = dict(cookies or {})

    with_opts = scheduled.withColumn(
        "_ua", user_agent_col(F.col("url"))
    ).withColumn("_proxy", proxy_col(F.col("url"), list(proxies)))

    out_schema = T.StructType(
        list(scheduled.schema.fields)
        + [
            T.StructField("html", T.BinaryType()),
            T.StructField("body_bytes", T.LongType()),
            T.StructField("http_status", T.IntegerType()),
        ]
    )
    passthrough = [f.name for f in scheduled.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies: list[bytes | None] = []
            statuses: list[int] = []
            for url, task, ua, proxy in zip(
                pdf["url"], pdf["task_name"], pdf["_ua"], pdf["_proxy"]
            ):
                try:
                    status, body = tp(
                        url, ua, proxy, cookie_by_task.get(task), timeout_s
                    )
                except Exception:
                    status, body = -1, None
                if status != 200:  # reference: non-200 is a fetch error
                    body = None
                bodies.append(body)
                statuses.append(status)
            out = pdf[passthrough].copy()
            out["html"] = pd.Series(bodies, dtype="object")
            out["body_bytes"] = pd.Series(
                [len(b) if b is not None else 0 for b in bodies], dtype="int64"
            )
            out["http_status"] = pd.Series(statuses, dtype="int32")
            yield out[out["html"].notna()]

    # cross-host parallelism: one slow host's sequential GETs stall only
    # its own partition (politeness already bounded the per-host rows)
    return (
        with_opts.repartition("host")
        .mapInPandas(run, schema=out_schema)
    )
