"""WARC archive source/sink (ISO 28500; the Common Crawl layout:
WARC/1.0 ``response`` records wrapping an HTTP/1.1 response payload).

Reference parity: the reference engine fetches live HTTP and never
touches archives (its fetch loop is engine/crawler.go); WARC ingest is
part of this repo's §2.5 training-pipeline surface — a 100 TB webtext
corpus arrives as WARC files, not parquet.

Scale shape:

- **read**: one task per WARC file; each task *streams* records off the
  file (headers line-by-line, body by Content-Length) and yields Arrow
  batches of ``batch_rows`` records, so memory is bounded by the batch,
  not the archive (Common Crawl files are ~1 GiB).  File paths are
  distributed as a DataFrame and opened executor-side — on a cluster
  that means a shared filesystem (HDFS/NFS/fuse mounts); an
  object-store variant swaps ``open()`` for a ranged-GET stream in the
  same iterator.
- **write**: one WARC file per partition, written executor-side; with a
  deterministic repartition key the file *contents* are reproducible
  run-to-run (file-to-record assignment is the partitioner's).

Record framing follows the spec strictly: CRLF header block, blank
line, exactly ``Content-Length`` payload bytes, then CRLF CRLF — bodies
are arbitrary binary and are never string-split.
"""

from __future__ import annotations

import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
import pyspark.sql.types as T

WARC_VERSION = b"WARC/1.0"

READ_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
])


# ------------------------------------------------------------ record IO
def _read_headers(fh: io.BufferedReader) -> dict[bytes, bytes] | None:
    """Read one CRLF-terminated header block.  Returns None at EOF."""
    # skip inter-record blank lines
    line = fh.readline()
    while line in (b"\r\n", b"\n"):
        line = fh.readline()
    if not line:
        return None
    if not line.rstrip(b"\r\n").startswith(WARC_VERSION):
        raise ValueError(f"not a WARC record header: {line[:40]!r}")
    headers: dict[bytes, bytes] = {}
    while True:
        line = fh.readline()
        if line in (b"\r\n", b"\n", b""):
            return headers
        k, _, v = line.rstrip(b"\r\n").partition(b":")
        headers[k.strip().lower()] = v.strip()


def _split_http_payload(payload: bytes) -> tuple[int, str, bytes]:
    """HTTP/1.1 response payload -> (status, content_type, body)."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return 0, "", payload
    lines = head.split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    ctype = ""
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def iter_warc_records(path: str) -> Iterator[dict]:
    """Stream records from one WARC file; O(record) memory."""
    with open(path, "rb") as fh:
        while True:
            headers = _read_headers(fh)
            if headers is None:
                return
            length = int(headers.get(b"content-length", b"0"))
            payload = fh.read(length)
            if len(payload) != length:
                raise ValueError(f"truncated record in {path}")
            rec = {
                "warc_file": os.path.basename(path),
                "warc_type": headers.get(b"warc-type", b"").decode("latin-1"),
                "target_uri": headers.get(b"warc-target-uri", b"").decode("latin-1"),
                "warc_date": headers.get(b"warc-date", b"").decode("latin-1"),
                "record_id": headers.get(b"warc-record-id", b"").decode("latin-1"),
                "http_status": 0,
                "content_type": "",
                "body": payload,
            }
            ct = headers.get(b"content-type", b"")
            if rec["warc_type"] == "response" and ct.startswith(b"application/http"):
                status, ctype, body = _split_http_payload(payload)
                rec.update(http_status=status, content_type=ctype, body=body)
            yield rec


def read_warc(spark: SparkSession, paths: list[str] | str,
              batch_rows: int = 1024) -> DataFrame:
    """Distributed WARC reader: one row per record, one task per file,
    streaming within the file.  ``paths`` = explicit file list or a
    directory (non-recursive ``*.warc``)."""
    if isinstance(paths, str):
        import glob as _g

        paths = sorted(_g.glob(os.path.join(paths, "*.warc")))
    if not paths:
        raise ValueError("read_warc: no input files")
    files = spark.createDataFrame([(p,) for p in paths], ["path"]).repartition(
        min(len(paths), spark.sparkContext.defaultParallelism), "path"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in READ_SCHEMA.fields]
        for pdf in batches:
            for p in pdf["path"]:
                buf: list[dict] = []
                for rec in iter_warc_records(p):
                    buf.append(rec)
                    if len(buf) >= batch_rows:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=cols)

    return files.mapInPandas(run, schema=READ_SCHEMA)


# ----------------------------------------------------------------- sink
def _format_record(uri: str, date: str, body: bytes, status: int,
                   content_type: str, record_id: str) -> bytes:
    http = (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1") + body
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("latin-1")
    return head + http + b"\r\n\r\n"


def write_warc(df: DataFrame, out_dir: str, uri_col: str = "url",
               date_col: str = "warc_date", body_col: str = "body",
               status_col: str | None = None,
               content_type: str = "text/html") -> None:
    """Write (uri, date, body) rows as WARC files, one per partition,
    executor-side.  Record IDs are deterministic (md5 of the URI) so a
    rewrite is byte-identical given the same partitioning.  Repartition
    by a stable key before calling for reproducible file contents."""
    os.makedirs(out_dir, exist_ok=True)
    status = F.col(status_col) if status_col else F.lit(200)
    slim = df.select(
        F.col(uri_col).alias("uri"),
        F.col(date_col).cast("string").alias("date"),
        F.col(body_col).alias("body"),
        status.cast("int").alias("status"),
        F.concat(F.lit("<urn:md5:"), F.md5(F.col(uri_col)), F.lit(">")).alias("rid"),
    ).sortWithinPartitions("uri")  # deterministic within-file record order
    out_schema = T.StructType([T.StructField("path", T.StringType()),
                               T.StructField("n_records", T.LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc")
        n = 0
        with open(path, "wb") as fh:
            for pdf in batches:
                for uri, date, body, status_, rid in pdf.itertuples(index=False):
                    fh.write(_format_record(
                        uri, date, bytes(body), int(status_), content_type, rid))
                    n += 1
        yield pd.DataFrame([{"path": path, "n_records": n}])

    # mapInPandas is lazy; the count() forces every partition to write.
    slim.mapInPandas(run, schema=out_schema).agg(F.sum("n_records")).collect()
