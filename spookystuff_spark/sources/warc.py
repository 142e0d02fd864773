"""WARC/1.0 web-archive source (ISO 28500 — the Common-Crawl container).

Spark-first layout: ``spark.read.format("binaryFile")`` lists the archive
files (driver never touches bytes), then ONE Arrow stage per file parses
records — a WARC file is the natural parallelism unit (Common Crawl ships
~1 GB gzip members; at 100 TB that is ~100k independent tasks with zero
shuffle). Gzip whole-file members are handled transparently; per-record gzip
(the other legal WARC encoding) is detected and decoded too, since gzip
members concatenate.

The reference fetches live pages into Observations
(module/core/.../doc/Observation.scala:12-87); ``warc_to_docs`` lands parsed
records in the same (uid, uri, mime, timestamp, content) shape so every
downstream doc operator (CSS selectors, dedup, quality) runs unchanged on
archived crawls.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import re
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, target_uri string, "
    "warc_date string, http_status int, http_content_type string, "
    "n_payload_bytes long, body binary"
)

_STATUS_RE = re.compile(rb"^HTTP/\d\.\d\s+(\d{3})")


def _split_records(raw: bytes) -> Iterator[bytes]:
    """Yield one raw record (headers+payload) per WARC record."""
    if raw[:2] == b"\x1f\x8b":
        # gzip: either whole-file or concatenated per-record members —
        # zlib's multi-member reader handles both identically
        raw = gzip.decompress(raw)
    pos, n = 0, len(raw)
    while pos < n:
        if raw[pos : pos + 5] != b"WARC/":
            # tolerate stray CRLF padding between records
            nxt = raw.find(b"WARC/", pos)
            if nxt < 0:
                return
            pos = nxt
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers = raw[pos : hdr_end + 2]
        m = re.search(rb"(?im)^Content-Length:\s*(\d+)\s*$", headers)
        length = int(m.group(1)) if m else 0
        payload_start = hdr_end + 4
        yield raw[pos : payload_start + length]
        pos = payload_start + length
        # consume the record separator (two CRLFs) — absent when per-record
        # gzip members were concatenated, so skip whatever CRLFs are present
        while raw[pos : pos + 2] == b"\r\n":
            pos += 2


def _parse_record(rec: bytes):
    hdr_end = rec.find(b"\r\n\r\n")
    headers, payload = rec[:hdr_end], rec[hdr_end + 4 :]

    def h(name: bytes) -> str:
        m = re.search(rb"(?im)^" + name + rb":\s*(.+?)\s*$", headers)
        return m.group(1).decode("latin-1") if m else ""

    warc_type = h(b"WARC-Type")
    status, http_ct, body = None, "", payload
    if warc_type in ("response", "revisit") and payload[:5] == b"HTTP/":
        he = payload.find(b"\r\n\r\n")
        http_headers = payload[:he] if he >= 0 else payload
        body = payload[he + 4 :] if he >= 0 else b""
        sm = _STATUS_RE.match(http_headers)
        status = int(sm.group(1)) if sm else None
        cm = re.search(rb"(?im)^Content-Type:\s*(.+?)\s*$", http_headers)
        http_ct = cm.group(1).decode("latin-1") if cm else ""
    return {
        "record_id": h(b"WARC-Record-ID"),
        "warc_type": warc_type,
        "target_uri": h(b"WARC-Target-URI"),
        "warc_date": h(b"WARC-Date"),
        "http_status": status,
        "http_content_type": http_ct,
        "n_payload_bytes": len(body),
        "body": body,
    }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse WARC file(s) at ``path`` (glob ok) into one row per record."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in _split_records(bytes(content)):
                    d = _parse_record(rec)
                    d["warc_file"] = path_.rsplit("/", 1)[-1]
                    rows.append(d)
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def warc_to_docs(warc_df: DataFrame) -> DataFrame:
    """Project response records into the engine's doc shape
    (uid, uri, mime, timestamp, content) — the same columns the fetch cache
    stores, so selectors/dedup/quality run on archives unchanged."""
    return (
        warc_df.where(F.col("warc_type") == "response")
        .select(
            F.sha2(F.col("body"), 256).alias("uid"),
            F.col("target_uri").alias("uri"),
            F.col("http_content_type").alias("mime"),
            F.to_timestamp("warc_date").alias("timestamp"),
            F.col("body").alias("content"),
        )
    )


def fixture_warc_bytes(n_pages: int = 24, seed: int = 7) -> list[bytes]:
    """Deterministic in-repo WARC corpus (no network in the container):
    synthetic HTML pages with id-derived titles/links. Returns
    [plain_warc_bytes, gzip_warc_bytes] — two files, both encodings."""

    def record(i: int) -> bytes:
        uri = f"http://corpus.example/page/{i}"
        title = f"Page {i} — {'spark shuffle' if i % 3 == 0 else 'agent fetch'}"
        links = "".join(
            f'<a href="/page/{j}">p{j}</a>' for j in range((i * 2) % 5)
        )
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>doc {i} body {'x' * (i * 11 % 97)}</p>{links}</body></html>"
        ).encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(html)}\r\n\r\n".encode()
            + html
        )
        rid = hashlib.md5(f"{seed}|{uri}".encode()).hexdigest()
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Record-ID: <urn:uuid:{rid}>\r\n".encode()
            + f"WARC-Date: 2026-01-{(i % 27) + 1:02d}T00:00:00Z\r\n".encode()
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        return hdr + http + b"\r\n\r\n"

    half = n_pages // 2
    plain = b"".join(record(i) for i in range(half))
    gz = gzip.compress(b"".join(record(i) for i in range(half, n_pages)))
    return [plain, gz]
