"""Fixed StructType schemas for every engine table.

The reference derives output schemas dynamically at save time
(/root/reference/collector/sqlstorage/sqlstorage.go:68-88) and keeps the
frontier as in-memory Go structs (collect/request.go:13-27).  Here every
table has a static, Arrow-compatible schema declared once (SURVEY.md §1).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- frontier
# One row per discovered request.  Mirrors collect/request.go:13-27 plus
# the engine-side columns the reference keeps in channel/queue state:
#   seq         discovery order (FIFO-within-priority contract,
#               engine/schedule.go:52-62)
#   parent_seq / link_pos   lineage of the discovery (deterministic
#               ordering key before seq assignment)
#   attempts    retry budget state (engine/crawler.go:179-194: 1 re-push)
#   round       scheduling round that discovered the row
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("task_name", T.StringType(), False),
        T.StructField("rule_name", T.StringType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("parent_seq", T.LongType(), False),
        T.StructField("link_pos", T.IntegerType(), False),
        T.StructField("tmp", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- pages
# BASELINE.json input_hint: Common-Crawl-style corpus.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------- results
# The reference's DataCell (collector/storage.go:7-18): reserved keys
# Task/Rule/Url/Time plus a per-rule field map (all values strings after
# MySQL MEDIUMTEXT coercion, sqlstorage.go:74-85,108-121).
RESULTS_SCHEMA = T.StructType(
    [
        T.StructField("task", T.StringType(), False),
        T.StructField("rule", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("data", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- seen
# Exact URL-seen set (reference: md5 map, engine/crawler.go:16-17).  The
# bloom filter is a pre-filter only; this table is the truth.
SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- robots
# north_rule addition; no reference analog (closest: per-task token
# buckets, limiter/limiter.go:16-45).
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_s", T.DoubleType(), True),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
        T.StructField("fetched_ts", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------- metrics / lineage
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("rows", T.LongType(), False),
    ]
)

FAILURES_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("reason", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
    ]
)
