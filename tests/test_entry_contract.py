"""Replicates the driver's correctness gate locally: for every query with
an oracle, run the Spark query and the DuckDB SQL at sf0.01 and compare
row count, schema (column names), and order-insensitive values.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")
    return con


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["source", "doc_id", "rn"]


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = [r.asDict() for r in sdf.collect()]
    ora = ddb.sql(entrymod.oracle_sql()[name])
    ora_cols = sorted(ora.columns)
    assert cols == ora_cols, f"{name}: column mismatch {cols} vs {ora_cols}"
    ora_rows = [dict(zip(ora.columns, t)) for t in ora.fetchall()]
    assert len(spark_rows) == len(ora_rows), f"{name}: row count"
    a, b = _normalize(spark_rows, cols), _normalize(ora_rows, cols)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:5]
    assert a == b, f"{name}: value mismatch, first diffs: {mism}"


def test_queries_without_oracle_run(spark):
    orc = set(entrymod.oracle_sql())
    for name, q in entrymod.queries().items():
        if name in orc:
            continue
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name
