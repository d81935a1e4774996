"""Unit tests for textops.pii_redact — the edge cases the contract
query's planted corpus doesn't isolate: pattern ORDER (email wins over
the IPv4 inside it), idempotence, and non-PII text passing through
untouched.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crawler_spark.functions import textops  # noqa: E402


def _redact_all(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    return [
        r["r"]
        for r in df.select(textops.pii_redact(F.col("t")).alias("r")).collect()
    ]


def test_pii_redact_kinds_and_order(spark):
    got = _redact_all(
        spark,
        [
            "write to bob.smith+x@sub.example.co.uk today",
            "server at 192.168.001.1 and 8.8.8.8",
            "call 555-867-5309 or 555 867 5309 or 555.867.5309",
            # numeric-host 'email' has no alpha TLD -> not an email; the
            # IP rule picks up the literal instead (same in the oracle)
            "weird but valid-ish a@1.2.3.4 host",
            # alpha TLD -> the email rule consumes the dotted host whole
            "mail a@b.cd.example.com please",
            "no pii here, just words and 12345 numbers",
        ],
    )
    assert got[0] == "write to <EMAIL> today"
    assert got[1] == "server at <IP> and <IP>"
    assert got[2] == "call <PHONE> or <PHONE> or <PHONE>"
    assert got[3] == "weird but valid-ish a@<IP> host"
    assert got[4] == "mail <EMAIL> please"
    assert got[5] == "no pii here, just words and 12345 numbers"


def test_pii_redact_idempotent(spark):
    texts = ["x@y.com at 1.2.3.4 call 555-867-5309"]
    once = _redact_all(spark, texts)
    twice = _redact_all(spark, once)
    assert once == twice == ["<EMAIL> at <IP> call <PHONE>"]
