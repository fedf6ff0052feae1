"""WARC 1.0 source — the format Common-Crawl-style corpora actually
arrive in (north_star: "Common-Crawl-style web pages"; the input_hint's
(url, warc_ts, html) columns are exactly what a WARC response record
carries).

Scope: the ISO 28500 subset Common Crawl emits — ``WARC/1.0`` header
block (CRLF lines, ``Name: value``), ``Content-Length``-delimited
payload, two blank CRLFs between records. ``response`` payloads carry
an HTTP message; the reader splits status + body so downstream sees the
same (url, warc_ts, html) shape the parquet corpus has.

Scale notes:
- One task per WARC file via ``binaryFile`` — matching how Common Crawl
  shards (~1 GB gzipped segments, tens of thousands of files). Gzipped
  WARC is inherently non-splittable; parallelism comes from file count,
  which at 100 TB is plentiful. ``spark.sql.files.maxPartitionBytes``
  does not split binaryFile rows, so executor memory must hold one
  decompressed shard — the same constraint every WARC consumer has.
- Parsing is one Arrow-batched ``mapInPandas`` pass; record payloads
  project straight into the extraction stage and never shuffle.
- A malformed record (bad length, truncated header) ends that FILE's
  parse at the failure point rather than crashing the job — degraded
  files surface via the per-file record count, not as task failures.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

CRLF = b"\r\n"

WARC_SCHEMA = StructType([
    StructField("warc_file", StringType()),
    StructField("record_index", LongType()),
    StructField("warc_type", StringType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("http_status", IntegerType()),
    StructField("content_type", StringType()),
    StructField("html", BinaryType()),
])


def build_warc(records: list[dict]) -> bytes:
    """Writer (tests / synthetic corpora): each record dict carries
    ``warc_type``, ``url``, ``warc_ts`` (datetime), ``body`` (bytes),
    and optional ``http_status`` (response records get an HTTP
    envelope, mirroring Common Crawl)."""
    out = io.BytesIO()
    for r in records:
        body = r["body"]
        if r["warc_type"] == "response":
            status = r.get("http_status", 200)
            ctype = r.get("content_type", "text/html")
            body = (f"HTTP/1.1 {status} OK\r\n"
                    f"Content-Type: {ctype}\r\n\r\n").encode() + body
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r["warc_type"].encode(),
        ]
        if r.get("url"):
            headers.append(b"WARC-Target-URI: " + r["url"].encode())
        if r.get("warc_ts"):
            headers.append(
                b"WARC-Date: "
                + r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ").encode())
        headers.append(b"Content-Length: " + str(len(body)).encode())
        out.write(CRLF.join(headers) + CRLF + CRLF + body + CRLF + CRLF)
    return out.getvalue()


def parse_warc(data: bytes) -> list[dict]:
    """Pure parser: [{warc_type, url, warc_ts, http_status, html}] in
    record order. Gzip (magic 1f 8b) is transparently decompressed.
    Parsing stops at the first malformed record (totality over crash)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except Exception:
            return []
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            break
        head_lines = data[pos:head_end].split(CRLF)
        if not head_lines or not head_lines[0].startswith(b"WARC/"):
            break
        fields: dict[str, str] = {}
        for line in head_lines[1:]:
            k, sep, v = line.partition(b": ")
            if sep:
                fields[k.decode("ascii", "replace").lower()] = \
                    v.decode("utf-8", "replace")
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        payload = data[head_end + 4:head_end + 4 + length]
        if len(payload) < length:
            break
        pos = head_end + 4 + length
        ts = None
        if "warc-date" in fields:
            try:
                ts = datetime.strptime(fields["warc-date"],
                                       "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                ts = None
        status = None
        content_type = None
        body = payload
        if fields.get("warc-type") == "response" and \
                payload[:5] == b"HTTP/":
            split = payload.find(CRLF + CRLF)
            if split >= 0:
                http_lines = payload[:split].split(CRLF)
                parts = http_lines[0].split(b" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in http_lines[1:]:
                    k, sep, v = line.partition(b":")
                    if sep and k.strip().lower() == b"content-type":
                        # lowercased: MIME types are case-insensitive
                        # (RFC 2045) and a lowercase column lets the
                        # text/html gate be a plain prefix filter
                        content_type = v.strip().decode(
                            "ascii", "replace").lower()
                        break
                body = payload[split + 4:]
        out.append({
            "warc_type": fields.get("warc-type"),
            "url": fields.get("warc-target-uri"),
            "warc_ts": ts,
            "http_status": status,
            "content_type": content_type,
            "html": body,
        })
    return out


def read_warc(spark: SparkSession, path: str,
              types: tuple[str, ...] = ("response",)) -> DataFrame:
    """(warc_file, record_index, warc_type, url, warc_ts, http_status,
    html) from a dir/glob of .warc / .warc.gz files. ``types`` filters
    record kinds early (request/metadata records are bulk that should
    never leave the parse stage)."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for fname, content in zip(b["path"], b["content"]):
                for i, r in enumerate(parse_warc(content)):
                    if types and r["warc_type"] not in types:
                        continue
                    rows.append((fname, i, r["warc_type"], r["url"],
                                 r["warc_ts"], r["http_status"],
                                 r["content_type"], r["html"]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(run, WARC_SCHEMA)


WET_SCHEMA = StructType([
    StructField("warc_file", StringType()),
    StructField("record_index", IntegerType()),
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("text", StringType()),
])


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Common-Crawl WET reader: ``conversion`` records (pre-extracted
    plain text, no HTTP envelope) from .wet / .wet.gz shards —
    (warc_file, record_index, url, warc_ts, text). Same
    one-task-per-shard binaryFile scan as :func:`read_warc` (gzip WET is
    non-splittable; parallelism = shard count) and the same tolerant
    record parser; bodies decode as UTF-8-replace, the WET contract.
    When the pipeline ingests WET instead of WARC, the html→text
    extraction stage is skipped — this frame feeds annotate/curation
    directly as the ``text`` column."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for fname, content in zip(b["path"], b["content"]):
                for i, r in enumerate(parse_warc(content)):
                    if r["warc_type"] != "conversion":
                        continue
                    rows.append((fname, i, r["url"], r["warc_ts"],
                                 r["html"].decode("utf-8", "replace")))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WET_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(run, WET_SCHEMA)
