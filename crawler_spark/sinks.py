"""K2-K4 JDBC sink parity: results -> one SQL table per task.

The reference's entire output side is a MySQL table per task
(collector/sqlstorage/sqlstorage.go:42-143): table name = task name
(collector/storage.go:11-13), columns = the task's ItemFields as
MEDIUMTEXT plus Url VARCHAR(250) and Time VARCHAR(255) (:68-88), rows
buffered and flushed as batched INSERTs (:90-143).  On Spark the
equivalents are free: ``engine.results_wide`` already produces exactly
that column set, and DataFrameWriter's jdbc format IS the batched
INSERT path (its ``batchsize`` option is the reference's BatchCount).

UNTESTABLE IN-SANDBOX: no JDBC driver jar and no database are present,
so this wrapper is code + documentation, excluded from the driver
contract (VERDICT r3 "What's missing #2").  The pieces that CAN be
verified without a DB — the per-task column-type mapping — are pure
functions with unit tests (tests/test_sinks.py).

Deployment notes (100 TB discipline):
- one executor connection per partition: ``coalesce`` the wide frame to
  a partition count the database tolerates before calling (a 1000-task
  cluster writing with 200k partitions is a connection storm);
- idempotence: the reference re-INSERTs on retry (no dedup); for
  exactly-once against a real warehouse, stage to parquet and LOAD, or
  write through a MERGE-capable sink (Iceberg) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .engine import results_wide
from .rules import FieldsRule, Task


def jdbc_column_types(task: Task) -> str:
    """``createTableColumnTypes`` string reproducing the reference's
    CREATE TABLE shape (sqlstorage.go:68-88): every ItemField (and
    tmp_field carry) MEDIUMTEXT, then Url VARCHAR(250), Time
    VARCHAR(255).  Column ORDER mirrors results_wide's output.  The
    reference's AutoKey auto-increment id is the database's own
    concern — Spark's jdbc writer never supplies it."""
    names: dict[str, None] = {}
    for rule in task.rules.values():
        if isinstance(rule, FieldsRule):
            if rule.tmp_field is not None:
                names.setdefault(rule.tmp_field[0])
            for f in rule.fields:
                names.setdefault(f.name)
    cols = [f"`{n}` MEDIUMTEXT" for n in names]
    cols += ["`Url` VARCHAR(250)", "`Time` VARCHAR(255)"]
    return ", ".join(cols)


def write_results_jdbc(
    results: DataFrame,
    task: Task,
    url: str,
    table: str | None = None,
    mode: str = "append",
    batchsize: int = 1000,
    num_connections: int = 8,
    **options: str,
) -> None:
    """Write one task's results to ``table`` (default: the task name,
    storage.go:11-13) over JDBC.

    ``url`` is a standard JDBC URL (the reference's MySQL shape:
    ``jdbc:mysql://host:3306/db?user=...&password=...``); ``batchsize``
    is the reference's BatchCount flush threshold (sqlstorage.go:60-62);
    ``num_connections`` caps writer parallelism = concurrent INSERT
    streams.  Extra ``options`` pass through to the writer (e.g.
    ``driver='com.mysql.cj.jdbc.Driver'``, ``isolationLevel``).

    Example::

        wide = None  # results table from the catalog
        write_results_jdbc(
            cat.read(spark, "results"), task,
            url="jdbc:mysql://db:3306/crawl",
            driver="com.mysql.cj.jdbc.Driver",
        )
    """
    wide = results_wide(results, task).coalesce(num_connections)
    writer = (
        wide.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table or task.name)
        .option("batchsize", str(batchsize))
        .option("createTableColumnTypes", jdbc_column_types(task))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()
