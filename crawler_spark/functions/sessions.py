"""Gap-based sessionization over the events table — batch window SQL
with a DuckDB oracle, plus the applyInPandasWithState streaming twin in
crawler_spark.streaming (asserted equal in tests).

A new session starts when the gap to the user's previous event exceeds
``gap_seconds``.  The batch kernel is two windows + one aggregate — one
shuffle on user_id, per-user work independent (the right unit at 10^9
users); nothing leaves the JVM.  Output bounds are epoch seconds
(bigint) so no raw timestamps cross the oracle comparison boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame, gap_seconds: int = 1800,
    user_col: str = "user_id", ts_col: str = "ts", id_col: str = "event_id",
) -> DataFrame:
    """-> (user_id, session_no, n_events, start_s, end_s), one row per
    session; session_no is 1-based in (ts, event_id) order."""
    w = Window.partitionBy("user_id").orderBy("s", "eid")
    marked = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(id_col).alias("eid"),
            F.unix_timestamp(F.col(ts_col)).alias("s"),
        )
        .withColumn("prev_s", F.lag("s").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev_s").isNull()
                | (F.col("s") - F.col("prev_s") > gap_seconds),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return marked.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("s").alias("start_s"),
        F.max("s").alias("end_s"),
    )


def sessionize_py(
    rows: list[tuple[int, int]], gap_seconds: int = 1800
) -> list[tuple[int, int, int, int]]:
    """Pure-Python core for one user's (epoch_s, event_id) rows ->
    [(session_no, n_events, start_s, end_s)].  Shared by the streaming
    state function and unit tests."""
    out: list[tuple[int, int, int, int]] = []
    sno = 0
    for s, _eid in sorted(rows):
        if not out or s - out[-1][3] > gap_seconds:
            sno += 1
            out.append((sno, 1, s, s))
        else:
            no, n, st, _ = out[-1]
            out[-1] = (no, n + 1, st, s)
    return out
