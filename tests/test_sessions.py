"""Sessionization: batch window kernel == pure-Python core == streaming
applyInPandasWithState twin (the custom stateful operator gate)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crawler_spark import streaming
from crawler_spark.functions import sessions

GAP = 100


def _events_df(spark):
    base = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # user 1: three bursts -> 3 sessions (gap 100s)
    for i, off in enumerate([0, 10, 20, 500, 510, 2000]):
        rows.append((1, i, base + datetime.timedelta(seconds=off)))
    # user 2: single event
    rows.append((2, 100, base))
    # user 3: boundary cases — exactly gap (same session), gap+1 (new)
    rows.append((3, 200, base))
    rows.append((3, 201, base + datetime.timedelta(seconds=GAP)))
    rows.append((3, 202, base + datetime.timedelta(seconds=2 * GAP + 1)))
    return spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")


def _batch_sessions(spark):
    return {
        (r.user_id, r.session_no): (r.n_events, r.start_s, r.end_s)
        for r in sessions.sessionize(_events_df(spark), gap_seconds=GAP).collect()
    }


def test_batch_sessionize_semantics(spark):
    got = _batch_sessions(spark)
    by_user = {}
    for (u, sno), v in got.items():
        by_user.setdefault(u, []).append((sno, *v))
    assert len(by_user[1]) == 3
    assert sorted(by_user[1])[0][1] == 3  # first burst has 3 events
    assert len(by_user[2]) == 1
    # exactly-gap joins, gap+1 splits
    assert len(by_user[3]) == 2
    assert sorted(by_user[3])[0][1] == 2


def test_python_core_matches_batch(spark):
    got = _batch_sessions(spark)
    df = _events_df(spark).select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("s")
    ).collect()
    by_user: dict[int, list] = {}
    for r in df:
        by_user.setdefault(r.user_id, []).append((r.s, r.event_id))
    want = {}
    for u, pairs in by_user.items():
        for sno, n, st, en in sessions.sessionize_py(pairs, GAP):
            want[(u, sno)] = (n, st, en)
    assert got == want


def test_streaming_twin_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    _events_df(spark).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .parquet(src)
    )
    out = streaming.run_to_memory(
        streaming.sessionize_stream(stream, gap_seconds=GAP), "t_sessions",
        mode="update",
    )
    got = {
        (r.user_id, r.session_no): (r.n_events, r.start_s, r.end_s)
        for r in out.collect()
    }
    assert got == _batch_sessions(spark)
